"""Golden tests: byte-for-byte comparison against the reference binary.

Each case synthesizes a queryname-sorted SAM, runs both the compiled
reference (tests/oracle.py builds it into .oracle/) and our CLI with
identical flags, and diffs every produced output file.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
import oracle  # noqa: E402


def _compare(tmp_path, sam_args, flags, outputs=("out.narrowPeak",)):
    d_ref = tmp_path / "ref"
    d_new = tmp_path / "new"
    d_ref.mkdir()
    d_new.mkdir()
    sam = str(tmp_path / "in.sam")
    oracle.random_sam(sam, **sam_args)

    r1 = oracle.run_oracle(["-t", sam] + flags, cwd=str(d_ref))
    r2 = oracle.run_ours(["-t", sam] + flags, cwd=str(d_new))
    assert r1.returncode == r2.returncode, (
        f"exit codes differ: ref {r1.returncode} ({r1.stderr[-500:]}) "
        f"vs ours {r2.returncode} ({r2.stderr[-2000:]})")
    for name in outputs:
        f_ref = d_ref / name
        f_new = d_new / name
        assert f_ref.exists() == f_new.exists(), name
        if f_ref.exists():
            ref_text = f_ref.read_bytes()
            new_text = f_new.read_bytes()
            if ref_text != new_text:
                rl = ref_text.decode().splitlines()
                nl = new_text.decode().splitlines()
                for i, (a, b) in enumerate(zip(rl, nl)):
                    assert a == b, (f"{name} line {i}:\n ref: {a}\n "
                                    f"new: {b}")
                assert len(rl) == len(nl), (
                    f"{name}: line count {len(rl)} vs {len(nl)}")
    return r1, r2


BASE = ["-o", "out.narrowPeak", "-f", "out.log", "-k", "out.pile",
        "-b", "out.bed"]
ALL_OUT = ("out.narrowPeak", "out.log", "out.pile", "out.bed")


def test_default_paired(tmp_path):
    _compare(tmp_path, dict(n_singles=0), BASE, ALL_OUT)


def test_unpaired_kept(tmp_path):
    _compare(tmp_path, dict(), BASE + ["-y"], ALL_OUT)


def test_extend(tmp_path):
    _compare(tmp_path, dict(), BASE + ["-w", "150"], ALL_OUT)


def test_avgext(tmp_path):
    _compare(tmp_path, dict(), BASE + ["-x"], ALL_OUT)


def test_qvalue(tmp_path):
    _compare(tmp_path, dict(), BASE + ["-y", "-q", "0.05"], ALL_OUT)


def test_atac(tmp_path):
    _compare(tmp_path, dict(), BASE + ["-j", "-y"], ALL_OUT)


def test_atac_custom_len(tmp_path):
    _compare(tmp_path, dict(), BASE + ["-j", "-d", "151", "-D", "-y"],
             ALL_OUT)


def test_min_mapq_and_asdiff(tmp_path):
    _compare(tmp_path, dict(), BASE + ["-y", "-m", "20", "-s", "5.0"],
             ALL_OUT)


def test_verbose_counts(tmp_path):
    r1, r2 = _compare(tmp_path, dict(), BASE + ["-y", "-v"], ALL_OUT)
    assert r1.stderr == r2.stderr
