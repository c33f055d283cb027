"""Differential fuzzing: random configs x random data vs the reference."""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
import oracle  # noqa: E402


@pytest.mark.parametrize("seed", range(100, 124))
def test_fuzz_config(tmp_path, seed):
    rng = random.Random(seed)
    chroms = [(f"chr{i}", rng.randrange(20_000, 200_000))
              for i in range(rng.randrange(1, 4))]
    sam = str(tmp_path / "in.sam")
    oracle.random_sam(sam, chroms=tuple(chroms),
                      n_pairs=rng.randrange(50, 500),
                      n_singles=rng.randrange(0, 150), seed=seed,
                      read_len=rng.choice((36, 50, 100)),
                      with_scores=rng.random() < 0.8,
                      cluster=rng.random() < 0.8)
    t_files = [sam]
    if rng.random() < 0.25:   # multi-replicate Fisher
        rep2 = str(tmp_path / "rep2.sam")
        oracle.random_sam(rep2, chroms=tuple(chroms),
                          n_pairs=rng.randrange(50, 300),
                          seed=seed + 9000)
        t_files.append(rep2)
    flags = ["-o", "out.np", "-f", "out.log"]
    if rng.random() < 0.3:    # control sample(s)
        if rng.random() < 0.3:
            flags += ["-c", "null"]
        else:
            ctrl = str(tmp_path / "ctrl.sam")
            oracle.random_sam(ctrl, chroms=tuple(chroms),
                              n_pairs=rng.randrange(50, 300),
                              seed=seed + 5000, cluster=False)
            flags += ["-c", ctrl]
    if rng.random() < 0.2 and len(chroms) > 1:
        flags += ["-e", chroms[-1][0]]
    if rng.random() < 0.3:
        flags += ["-k", "out.k"]
    if rng.random() < 0.3:
        flags += ["-b", "out.bed"]
    if rng.random() < 0.7:
        flags.append("-y")
    mode = rng.random()
    if mode < 0.3:
        flags += ["-j"]
        if rng.random() < 0.5:
            flags += ["-d", str(rng.randrange(20, 300))]
    elif mode < 0.5:
        flags += ["-w", str(rng.randrange(50, 400))]
    elif mode < 0.7:
        flags += ["-x"]
    if rng.random() < 0.5:
        flags += ["-q", f"{rng.uniform(0.05, 0.9):.2f}"]
    else:
        flags += ["-p", f"{rng.uniform(0.001, 0.5):.3f}"]
    flags += ["-a", f"{rng.uniform(0, 50):.1f}",
              "-g", str(rng.randrange(10, 500))]
    if rng.random() < 0.4:
        flags += ["-r"]
    if rng.random() < 0.3:
        flags += ["-m", str(rng.randrange(0, 61))]
    if rng.random() < 0.3:
        flags += ["-s", f"{rng.uniform(0, 10):.1f}"]
    if rng.random() < 0.3:
        name, ln = rng.choice(chroms)
        b = tmp_path / "x.bed"
        lines = []
        for _ in range(rng.randrange(1, 5)):
            s0 = rng.randrange(0, ln)
            lines.append(f"{name}\t{s0}\t{s0 + rng.randrange(1, 5000)}")
        b.write_text("\n".join(lines) + "\n")
        flags += ["-E", str(b)]

    d_ref = tmp_path / "ref"
    d_new = tmp_path / "new"
    d_ref.mkdir()
    d_new.mkdir()
    targs = ["-t", ",".join(t_files)]
    r1 = oracle.run_oracle(targs + flags + ["-v"], cwd=str(d_ref))
    r2 = oracle.run_ours(targs + flags + ["-v"], cwd=str(d_new))
    assert r1.returncode == r2.returncode, (flags, r1.stderr[-300:],
                                            r2.stderr[-1200:])
    assert r1.stderr == r2.stderr, (flags,)
    for name in ("out.np", "out.log", "out.k", "out.bed"):
        fa, fb = d_ref / name, d_new / name
        assert fa.exists() == fb.exists()
        if fa.exists():
            assert fa.read_bytes() == fb.read_bytes(), (flags, name)
