"""Golden tests: controls, replicates, dedup, exclusions, BAM, -X, -z."""

from __future__ import annotations

import gzip
import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
import oracle  # noqa: E402


def _run_both(tmp_path, flags, outputs, setup):
    d_ref = tmp_path / "ref"
    d_new = tmp_path / "new"
    d_ref.mkdir()
    d_new.mkdir()
    setup(tmp_path)
    r1 = oracle.run_oracle(flags, cwd=str(d_ref))
    r2 = oracle.run_ours(flags, cwd=str(d_new))
    assert r1.returncode == r2.returncode, (
        f"exit codes: ref {r1.returncode} ({r1.stderr[-400:]}) vs "
        f"ours {r2.returncode} ({r2.stderr[-2000:]})")
    for name in outputs:
        f_ref, f_new = d_ref / name, d_new / name
        assert f_ref.exists() == f_new.exists(), name
        if not f_ref.exists():
            continue
        ref_b, new_b = f_ref.read_bytes(), f_new.read_bytes()
        if name.endswith(".gz"):
            ref_b, new_b = gzip.decompress(ref_b), gzip.decompress(new_b)
        if ref_b != new_b:
            rl, nl = ref_b.decode().splitlines(), new_b.decode().splitlines()
            for i, (a, b) in enumerate(zip(rl, nl)):
                assert a == b, f"{name} line {i}:\n ref: {a}\n new: {b}"
            assert len(rl) == len(nl), name
    return r1, r2


OUT = ("out.narrowPeak", "out.log", "out.pile", "out.bed")
BASE = ["-o", "out.narrowPeak", "-f", "out.log", "-k", "out.pile",
        "-b", "out.bed", "-v"]


def test_control_sample(tmp_path):
    def setup(d):
        oracle.random_sam(str(d / "expt.sam"), seed=1)
        oracle.random_sam(str(d / "ctrl.sam"), seed=2, cluster=False,
                          n_pairs=200)
    r1, r2 = _run_both(
        tmp_path, ["-t", str(tmp_path / "expt.sam"),
                   "-c", str(tmp_path / "ctrl.sam")] + BASE + ["-y"],
        OUT, setup)
    assert r1.stderr == r2.stderr


def test_null_control_and_multi_replicate(tmp_path):
    def setup(d):
        oracle.random_sam(str(d / "a.sam"), seed=3)
        oracle.random_sam(str(d / "b.sam"), seed=4, n_pairs=250)
        oracle.random_sam(str(d / "c.sam"), seed=5, cluster=False,
                          n_pairs=150)
    r1, r2 = _run_both(
        tmp_path,
        ["-t", f"{tmp_path}/a.sam,{tmp_path}/b.sam",
         "-c", f"{tmp_path}/c.sam,null"] + BASE + ["-y", "-q", "0.5"],
        OUT, setup)
    assert r1.stderr == r2.stderr


def test_three_replicates_fisher(tmp_path):
    def setup(d):
        for i, seed in enumerate((7, 8, 9)):
            oracle.random_sam(str(d / f"r{i}.sam"), seed=seed)
    _run_both(
        tmp_path,
        ["-t", ",".join(f"{tmp_path}/r{i}.sam" for i in range(3))]
        + BASE + ["-p", "0.05", "-a", "20"], OUT, setup)


def test_exclusions(tmp_path):
    def setup(d):
        oracle.random_sam(str(d / "in.sam"), seed=11)
        (d / "excl.bed").write_text(
            "chr1\t2000\t6000\nchr1\t5000\t9000\nchr1\t0\t500\n"
            "chr2\t100\t200\nchr2\t49000\t60000\n")
    r1, r2 = _run_both(
        tmp_path,
        ["-t", str(tmp_path / "in.sam"), "-E",
         str(tmp_path / "excl.bed"), "-e", "chr2"] + BASE
        + ["-y", "-q", "0.9"], OUT, setup)
    assert r1.stderr == r2.stderr


def test_dedup(tmp_path):
    def setup(d):
        b = oracle.SamBuilder([("chr1", 100000)], seed=13)
        rng = b.rng
        # paired dups: same coords, different quality strings
        for _ in range(120):
            p1 = rng.randrange(1000, 90000)
            p2 = p1 + rng.randrange(60, 300)
            for k in range(rng.choice((1, 1, 1, 2, 3))):
                qual = chr(33 + rng.randrange(10, 40)) * 50
                b.add_pair("chr1", p1, p2, score=-k, qual=qual)
        # discordant: R1+R2 both aligned but not properly paired
        for _ in range(40):
            p1 = rng.randrange(1000, 90000)
            p2 = rng.randrange(1000, 90000)
            for k in range(rng.choice((1, 1, 2))):
                q = b._qname()
                b.add_single("chr1", p1, paired_flags=True, first=True,
                             qname=q, score=-1)
                b.records[-1] = b.records[-2] + b.records[-1]
                del b.records[-2]
                b.add_single("chr1", p2, paired_flags=True, first=False,
                             qname=q, score=-1)
                b.records[-1] = b.records[-2] + b.records[-1]
                del b.records[-2]
        # singletons (incl. dups of pair ends)
        for _ in range(60):
            pos = rng.randrange(1000, 90000)
            for k in range(rng.choice((1, 1, 2))):
                b.add_single("chr1", pos, reverse=rng.random() < 0.5,
                             score=0)
        b.write(str(d / "in.sam"))
    r1, r2 = _run_both(
        tmp_path,
        ["-t", str(tmp_path / "in.sam"), "-r", "-R", "out.dups"]
        + BASE + ["-y", "-p", "0.1", "-a", "10"],
        OUT + ("out.dups",), setup)
    assert r1.stderr == r2.stderr


def test_dedup_atac_avgext(tmp_path):
    def setup(d):
        b = oracle.SamBuilder([("chr1", 80000), ("chr2", 30000)],
                              seed=17)
        rng = b.rng
        for _ in range(150):
            c = rng.choice(("chr1", "chr2"))
            lim = 70000 if c == "chr1" else 25000
            p1 = rng.randrange(500, lim)
            p2 = p1 + rng.randrange(60, 250)
            for k in range(rng.choice((1, 1, 2))):
                qual = chr(33 + rng.randrange(5, 40)) * 50
                b.add_pair(c, p1, p2, qual=qual, score=-k)
        for _ in range(50):
            c = rng.choice(("chr1", "chr2"))
            lim = 70000 if c == "chr1" else 25000
            b.add_single(c, rng.randrange(500, lim),
                         reverse=rng.random() < 0.5, score=0)
        b.write(str(d / "in.sam"))
    r1, r2 = _run_both(
        tmp_path,
        ["-t", str(tmp_path / "in.sam"), "-r", "-R", "out.dups",
         "-j", "-x"] + BASE + ["-p", "0.1", "-a", "10"],
        OUT + ("out.dups",), setup)
    assert r1.stderr == r2.stderr


def test_multimappers(tmp_path):
    def setup(d):
        b = oracle.SamBuilder([("chr1", 100000)], seed=19)
        rng = b.rng
        # templates with N pair alignments, N in 2..12 (hits every
        # fractional class and the 7/9/>10 subsampling paths)
        for n in (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12):
            for _ in range(12):
                q = b._qname()
                group = []
                for k in range(n):
                    p1 = rng.randrange(1000, 90000)
                    p2 = p1 + rng.randrange(60, 250)
                    b.add_pair("chr1", p1, p2, score=0,
                               secondary=k > 0, qname=q)
                    group += b.records.pop()
                b.records.append(group)
        b.write(str(d / "in.sam"))
    r1, r2 = _run_both(
        tmp_path,
        ["-t", str(tmp_path / "in.sam")] + BASE
        + ["-y", "-p", "0.2", "-a", "5", "-s", "2"], OUT, setup)
    assert r1.stderr == r2.stderr


def test_no_peaks_X(tmp_path):
    def setup(d):
        oracle.random_sam(str(d / "in.sam"), seed=23)
    _run_both(
        tmp_path,
        ["-t", str(tmp_path / "in.sam"), "-X", "-f", "out.log",
         "-q", "0.5", "-y"], ("out.log", "out.narrowPeak"), setup)


def test_gzip_output(tmp_path):
    def setup(d):
        oracle.random_sam(str(d / "in.sam"), seed=29)
    _run_both(
        tmp_path,
        ["-t", str(tmp_path / "in.sam"), "-o", "out.narrowPeak",
         "-f", "out.log", "-z", "-p", "0.01", "-a", "20", "-y"],
        ("out.narrowPeak.gz", "out.log.gz"), setup)


@pytest.mark.parametrize("framing", ["gzip", "bgzf"])
def test_bam_input(tmp_path, framing):
    """BAM goldens in both framings; bgzf drives the native
    multithreaded BGZF decompressor (native/ingest.cpp) under oracle
    comparison."""
    def setup(d):
        oracle.random_sam(str(d / "in.sam"), seed=31, n_pairs=900)
        oracle.sam_to_bam(str(d / "in.sam"), str(d / "in.bam"),
                          framing=framing)
    r1, r2 = _run_both(
        tmp_path,
        ["-t", str(tmp_path / "in.bam")] + BASE
        + ["-y", "-p", "0.01", "-a", "20"], OUT, setup)
    assert r1.stderr == r2.stderr


@pytest.mark.parametrize("framing", ["gzip", "bgzf"])
def test_bam_matches_sam(tmp_path, framing):
    def setup(d):
        oracle.random_sam(str(d / "in.sam"), seed=37)
        oracle.sam_to_bam(str(d / "in.sam"), str(d / "in.bam"),
                          framing=framing)
    setup(tmp_path)
    d1 = tmp_path / "s"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()
    a = ["-o", "o.np", "-y", "-p", "0.05", "-a", "10"]
    r1 = oracle.run_ours(["-t", str(tmp_path / "in.sam")] + a, str(d1))
    r2 = oracle.run_ours(["-t", str(tmp_path / "in.bam")] + a, str(d2))
    assert r1.returncode == r2.returncode == 0, r2.stderr[-1000:]
    assert (d1 / "o.np").read_bytes() == (d2 / "o.np").read_bytes()


def _corrupt_case(tmp_path, mutate, case):
    """Build a BGZF BAM, mutate its bytes, compare ref vs both
    ingests (exit code + final stderr line; Genrich.c:4633-4646
    ERRBAM on a short/failed read)."""
    sam = tmp_path / "in.sam"
    bam = tmp_path / f"{case}.bam"
    oracle.random_sam(str(sam), seed=41, n_pairs=900)
    oracle.sam_to_bam(str(sam), str(bam), framing="bgzf")
    data = bytearray(bam.read_bytes())
    bam.write_bytes(bytes(mutate(data)))
    args = ["-t", str(bam), "-o", "out.np", "-y"]
    r_ref = oracle.run_oracle(args, cwd=str(tmp_path))
    assert r_ref.returncode == 1, (case, r_ref.stderr[-300:])
    for backend in ("native", "python"):
        r = oracle.run_ours(args + ["--ingest", backend],
                            cwd=str(tmp_path))
        assert r.returncode == r_ref.returncode, (
            case, backend, r_ref.stderr[-200:], r.stderr[-800:])
        assert r.stderr.splitlines()[-1] == \
            r_ref.stderr.splitlines()[-1], (case, backend,
                                            r.stderr[-500:])


def test_bgzf_truncated_block(tmp_path):
    # chop mid-block (drop EOF marker + half the last real block)
    _corrupt_case(tmp_path, lambda d: d[:(len(d) - 28) * 3 // 4],
                  "trunc")


def test_bgzf_corrupt_crc(tmp_path):
    def mutate(d):
        # flip a byte in the deflate payload of the second block so
        # its CRC check fails mid-stream
        bsize = struct.unpack_from("<H", d, 16)[0] + 1
        d[bsize + 40] ^= 0xFF
        return d
    _corrupt_case(tmp_path, mutate, "crc")
