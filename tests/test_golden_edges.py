"""Golden edge cases: -L, empty samples, ctrl-only chroms, errors."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import oracle  # noqa: E402


def _run_both(tmp_path, flags, outputs=("out.np",)):
    d1 = tmp_path / "ref"
    d2 = tmp_path / "new"
    d1.mkdir(exist_ok=True)
    d2.mkdir(exist_ok=True)
    r1 = oracle.run_oracle(flags, cwd=str(d1))
    r2 = oracle.run_ours(flags, cwd=str(d2))
    assert r1.returncode == r2.returncode, (r1.stderr[-400:],
                                            r2.stderr[-1500:])
    for name in outputs:
        f1, f2 = d1 / name, d2 / name
        assert f1.exists() == f2.exists(), name
        if f1.exists():
            assert f1.read_bytes() == f2.read_bytes(), name
    return r1, r2


def test_genome_len_flag(tmp_path):
    sam = str(tmp_path / "in.sam")
    oracle.random_sam(sam, seed=61)
    r1, r2 = _run_both(
        tmp_path, ["-t", sam, "-o", "out.np", "-y", "-q", "0.5",
                   "-L", "3000000000", "-v"])
    assert r1.stderr == r2.stderr
    assert "Genome length: 3000000000bp" in r2.stderr


def test_no_fragments_error(tmp_path):
    # only unpaired alns without -y: no fragments -> ERREXPT
    b = oracle.SamBuilder([("chr1", 10000)], seed=62)
    for i in range(5):
        b.add_single("chr1", 100 * i)
    b.write(str(tmp_path / "in.sam"))
    r1, r2 = _run_both(tmp_path,
                       ["-t", str(tmp_path / "in.sam"), "-o", "out.np"])
    assert r1.returncode == 1
    assert r1.stderr == r2.stderr


def test_ctrl_only_chrom(tmp_path):
    # ctrl has an extra chromosome the expt lacks: save=false there
    be = oracle.SamBuilder([("chr1", 50000)], seed=63)
    for _ in range(200):
        p1 = be.rng.randrange(0, 45000)
        be.add_pair("chr1", p1, p1 + 100)
    be.write(str(tmp_path / "e.sam"))
    bc = oracle.SamBuilder([("chr1", 50000), ("chr9", 30000)], seed=64)
    for _ in range(100):
        c = bc.rng.choice(("chr1", "chr9"))
        lim = 45000 if c == "chr1" else 25000
        p1 = bc.rng.randrange(0, lim)
        bc.add_pair(c, p1, p1 + 120)
    bc.write(str(tmp_path / "c.sam"))
    r1, r2 = _run_both(
        tmp_path,
        ["-t", str(tmp_path / "e.sam"), "-c", str(tmp_path / "c.sam"),
         "-o", "out.np", "-f", "out.log", "-p", "0.2", "-a", "5",
         "-v"], ("out.np", "out.log"))
    assert r1.stderr == r2.stderr


def test_orphan_pairs(tmp_path):
    # paired flags but mate unmapped (0x8): 'orphan' counting
    b = oracle.SamBuilder([("chr1", 50000)], seed=65)
    for _ in range(100):
        p1 = b.rng.randrange(0, 45000)
        b.add_pair("chr1", p1, p1 + 100)
    for _ in range(30):
        b.add_single("chr1", b.rng.randrange(0, 45000),
                     paired_flags=True, first=b.rng.random() < 0.5)
    b.write(str(tmp_path / "in.sam"))
    r1, r2 = _run_both(
        tmp_path, ["-t", str(tmp_path / "in.sam"), "-o", "out.np",
                   "-y", "-p", "0.2", "-a", "5", "-v"])
    assert r1.stderr == r2.stderr


def test_negative_genome_len_wraps(tmp_path):
    # the reference's uint64 genomeLen silently wraps -L -5
    sam = str(tmp_path / "in.sam")
    oracle.random_sam(sam, seed=66)
    r1, r2 = _run_both(tmp_path, ["-t", sam, "-o", "out.np", "-L",
                                  "-5", "-v"])
    assert r1.returncode == r2.returncode == 0
    assert r1.stderr == r2.stderr


def test_mixed_sam_bam_replicates(tmp_path):
    s1 = str(tmp_path / "a.sam")
    oracle.random_sam(s1, seed=67)
    b1 = str(tmp_path / "b.bam")
    s2 = str(tmp_path / "b.sam")
    oracle.random_sam(s2, seed=68, n_pairs=200)
    oracle.sam_to_bam(s2, b1)
    r1, r2 = _run_both(
        tmp_path, ["-t", f"{s1},{b1}", "-o", "out.np", "-y", "-p",
                   "0.1", "-a", "10", "-v"])
    assert r1.stderr == r2.stderr
