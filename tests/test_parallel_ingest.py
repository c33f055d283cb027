"""Parallel record parsing (native walker + span workers).

Byte-parity vs the sequential parse, with GENRICH_INGEST_SPAN shrunk
so even small fixtures split into many spans and every merge path is
exercised: counters, event order, dedup stores (file-order
tie-breaks), -b rows, -v warning text and its cap, and the
non-associative totalLen double (-x avg extension).
"""

from __future__ import annotations

import os

import pytest

import conftest  # noqa: F401
import oracle


def _run(tmp_path, name, infile, extra, env):
    d = tmp_path / name
    d.mkdir()
    e = dict(os.environ)
    e.update(env)
    r = oracle.run_ours(
        ["-t", str(tmp_path / infile), "-o", "out.np", "-v",
         "-p", "0.01", "-a", "20"] + extra, cwd=str(d), env=e)
    assert r.returncode == 0, r.stderr[-1500:]
    return d, r.stderr


CASES = [
    ("plain", []),
    ("dedup", ["-r", "-y"]),
    ("atac_dups_bed", ["-j", "-r", "-b", "frags.bed"]),
    ("avg_ext", ["-x"]),          # totalLen double must be bit-exact
]


@pytest.mark.parametrize("fmt", ["sam", "bam"])
@pytest.mark.parametrize("case,extra", CASES, ids=[c[0] for c in CASES])
def test_parallel_matches_sequential(tmp_path, fmt, case, extra):
    oracle.random_sam(str(tmp_path / "in.sam"), seed=31, n_pairs=500,
                      n_singles=120)
    infile = "in.sam"
    if fmt == "bam":
        oracle.sam_to_bam(str(tmp_path / "in.sam"),
                          str(tmp_path / "in.bam"))
        infile = "in.bam"
    seq_env = {"GENRICH_INGEST_THREADS": "0"}
    par_env = {"GENRICH_INGEST_THREADS": "3",
               "GENRICH_INGEST_SPAN": "997"}   # many tiny spans
    ds, es = _run(tmp_path, f"seq{fmt}{case}", infile, extra, seq_env)
    dp, ep = _run(tmp_path, f"par{fmt}{case}", infile, extra, par_env)
    assert (ds / "out.np").read_bytes() == (dp / "out.np").read_bytes()
    assert es == ep          # -v counter block + warnings, verbatim
    if "-b" in extra:
        assert (ds / "frags.bed").read_bytes() \
            == (dp / "frags.bed").read_bytes()


def test_parallel_warning_cap(tmp_path):
    """>MAX_ALNS clamp warnings: text and the 128-cap must match the
    sequential order across span boundaries."""
    b = oracle.SamBuilder([("chr1", 1000)], seed=3)
    for i in range(200):    # every fragment ends past the chrom end
        b.add_pair("chr1", 900, 960)
    b.write(str(tmp_path / "in.sam"))
    seq_env = {"GENRICH_INGEST_THREADS": "0"}
    par_env = {"GENRICH_INGEST_THREADS": "3",
               "GENRICH_INGEST_SPAN": "499"}
    ds, es = _run(tmp_path, "seqw", "in.sam", ["-y"], seq_env)
    dp, ep = _run(tmp_path, "parw", "in.sam", ["-y"], par_env)
    assert es == ep
    assert "prevented from extending past" in es
    assert "warning messages suppressed" in es


def test_parallel_error_first_span_wins(tmp_path):
    """A malformed record mid-file errors identically (first error in
    file order), with earlier groups' state intact."""
    good = oracle.SamBuilder([("chr1", 100000)], seed=5)
    for i in range(50):
        good.add_pair("chr1", 1000 + i, 1400 + i)
    good.write(str(tmp_path / "in.sam"))
    with open(tmp_path / "in.sam", "a") as f:
        f.write("badline_no_tabs\n")
    for t, span in (("0", "100000"), ("3", "307")):
        d = tmp_path / f"err{t}"
        d.mkdir()
        e = dict(os.environ)
        e.update({"GENRICH_INGEST_THREADS": t,
                  "GENRICH_INGEST_SPAN": span})
        r = oracle.run_ours(["-t", str(tmp_path / "in.sam"), "-o",
                             "out.np", "-y"], cwd=str(d), env=e)
        assert r.returncode != 0
        assert "unknown" in r.stderr or "Error" in r.stderr
        if t == "0":
            want = r.stderr
        else:
            assert r.stderr == want


def test_parallel_strtol_flag_mapq_fields(tmp_path):
    """FLAG/MAPQ values only strtol accepts ('+16', negative MAPQ):
    the walker must classify them exactly like the worker's get_long
    (round-3 advisor finding), so the parallel parse stays
    byte-identical to sequential — and both to the reference, whose
    getInt is also strtol-based."""
    b = oracle.SamBuilder([("chr1", 100000)], seed=9)
    for i in range(60):
        b.add_pair("chr1", 1000 + 13 * i, 1500 + 13 * i)
    b.write(str(tmp_path / "in.sam"))
    # rewrite some records' FLAG/MAPQ into strtol-accepted oddities:
    # an explicit '+' sign, and a negative MAPQ (casts to uint8 246)
    lines = (tmp_path / "in.sam").read_text().splitlines()
    out = []
    n_odd = 0
    for ln in lines:
        f = ln.split("\t")
        if not ln.startswith("@") and len(f) > 10:
            if n_odd % 3 == 0:
                f[1] = "+" + f[1]
            elif n_odd % 3 == 1:
                f[4] = "-10"
            n_odd += 1
        out.append("\t".join(f))
    (tmp_path / "in.sam").write_text("\n".join(out) + "\n")
    seq_env = {"GENRICH_INGEST_THREADS": "0"}
    par_env = {"GENRICH_INGEST_THREADS": "3",
               "GENRICH_INGEST_SPAN": "613"}
    ds, es = _run(tmp_path, "seqf", "in.sam", ["-y"], seq_env)
    dp, ep = _run(tmp_path, "parf", "in.sam", ["-y"], par_env)
    assert (ds / "out.np").read_bytes() == (dp / "out.np").read_bytes()
    assert es == ep
    # and both equal the compiled reference on the same oddities
    import subprocess
    ref = oracle.build_oracle()
    d = tmp_path / "ref"
    d.mkdir()
    r = subprocess.run([ref, "-t", str(tmp_path / "in.sam"), "-o",
                        "out.np", "-y", "-p", "0.01", "-a", "20"],
                       cwd=str(d), capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert (d / "out.np").read_bytes() \
        == (ds / "out.np").read_bytes()


@pytest.mark.parametrize("seed", [700, 705, 711, 723])
def test_parallel_fuzz_configs(tmp_path, seed, monkeypatch):
    """Random config x random data differential fuzz with the
    span-parallel parser forced on: same oracle comparison as
    test_golden_fuzz, exercising walker classification, span merges,
    and shard warning buffers under arbitrary flag mixes."""
    monkeypatch.setenv("GENRICH_INGEST_THREADS", "3")
    monkeypatch.setenv("GENRICH_INGEST_SPAN", "731")
    import test_golden_fuzz as fz
    fz.test_fuzz_config(tmp_path, seed)
