"""Golden tests for -P (peaks-only from a -f log)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import oracle  # noqa: E402


def _prep_log(tmp_path, gen_flags, seed=41, multi=False):
    sam = str(tmp_path / "in.sam")
    oracle.random_sam(sam, seed=seed)
    t = sam
    if multi:
        sam2 = str(tmp_path / "in2.sam")
        oracle.random_sam(sam2, seed=seed + 1, n_pairs=200)
        t = f"{sam},{sam2}"
    d = tmp_path / "gen"
    d.mkdir()
    r = oracle.run_oracle(["-t", t, "-f", "log.bdg"] + gen_flags,
                          cwd=str(d))
    assert r.returncode == 0, r.stderr
    return str(d / "log.bdg")


def _compare_p(tmp_path, log, flags):
    d_ref = tmp_path / "ref"
    d_new = tmp_path / "new"
    d_ref.mkdir()
    d_new.mkdir()
    args = ["-P", "-f", log, "-o", "out.np"] + flags
    r1 = oracle.run_oracle(args, cwd=str(d_ref))
    r2 = oracle.run_ours(args, cwd=str(d_new))
    assert r1.returncode == r2.returncode, (r1.stderr[-300:],
                                            r2.stderr[-1500:])
    assert (d_ref / "out.np").read_bytes() == \
        (d_new / "out.np").read_bytes()
    assert r1.stderr == r2.stderr
    return r1, r2


def test_recall_pval(tmp_path):
    log = _prep_log(tmp_path, ["-X", "-y"])
    _compare_p(tmp_path, log, ["-p", "0.05", "-a", "20", "-v"])


def test_recall_qval(tmp_path):
    log = _prep_log(tmp_path, ["-o", "o.np", "-q", "0.5", "-y"])
    _compare_p(tmp_path, log, ["-q", "0.2", "-a", "10", "-v"])


def test_recall_multirep(tmp_path):
    log = _prep_log(tmp_path, ["-X", "-q", "0.5"], multi=True)
    _compare_p(tmp_path, log, ["-p", "0.1", "-a", "10", "-v"])


def test_recall_posthoc_exclusions(tmp_path):
    log = _prep_log(tmp_path, ["-X", "-y"])
    (tmp_path / "excl.bed").write_text(
        "chr1\t3000\t7000\nchr1\t20000\t21000\nchr2\t0\t5000\n")
    _compare_p(tmp_path, log,
               ["-p", "0.05", "-a", "10", "-E",
                str(tmp_path / "excl.bed"), "-e", "chr2", "-v"])


def test_recall_min_len_gap(tmp_path):
    log = _prep_log(tmp_path, ["-X", "-y"])
    _compare_p(tmp_path, log,
               ["-p", "0.1", "-a", "5", "-l", "300", "-g", "10", "-v"])
