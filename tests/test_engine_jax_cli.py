"""--engine jax CLI path: device pileup+p-values, host stats tail."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import oracle  # noqa: E402


def _run(tmp_path, name, extra):
    d = tmp_path / name
    d.mkdir()
    r = oracle.run_ours(
        ["-t", str(tmp_path / "in.sam"), "-o", "out.np", "-y",
         "-p", "0.01", "-a", "20"] + extra, cwd=str(d))
    assert r.returncode == 0, r.stderr[-1500:]
    return (d / "out.np").read_text().splitlines()


def test_jax_engine_matches_exact_boundaries(tmp_path):
    oracle.random_sam(str(tmp_path / "in.sam"), seed=71)
    env = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}
    os.environ.update(env)
    exact = _run(tmp_path, "exact", [])
    fast = _run(tmp_path, "jax", ["--engine", "jax"])
    assert len(exact) == len(fast)
    for a, b in zip(exact, fast):
        fa, fb = a.split("\t"), b.split("\t")
        # identical coordinates/name/score/strand; float columns close
        assert fa[:6] == fb[:6], (a, b)
        for i in (6, 7):
            x, y = float(fa[i]), float(fb[i])
            assert abs(x - y) <= 1e-4 * max(1.0, abs(x)), (a, b)


def test_jax_engine_multi_replicate_fisher(tmp_path):
    oracle.random_sam(str(tmp_path / "in.sam"), seed=81)
    oracle.random_sam(str(tmp_path / "b.sam"), seed=82, n_pairs=250)
    os.environ.update({"PALLAS_AXON_POOL_IPS": "",
                       "JAX_PLATFORMS": "cpu"})
    reps = f"{tmp_path / 'in.sam'},{tmp_path / 'b.sam'}"

    def run(name, extra):
        d = tmp_path / name
        d.mkdir()
        r = oracle.run_ours(["-t", reps, "-o", "out.np", "-y", "-p",
                             "0.01", "-a", "20"] + extra, cwd=str(d))
        assert r.returncode == 0, r.stderr[-1500:]
        return (d / "out.np").read_text().splitlines()

    exact = run("exact2", [])
    fast = run("jax2", ["--engine", "jax"])
    assert len(exact) == len(fast)
    same = sum(a.split("\t")[:6] == b.split("\t")[:6]
               for a, b in zip(exact, fast))
    assert same >= len(exact) * 0.9
    for a, b in zip(exact, fast):
        fa, fb = a.split("\t"), b.split("\t")
        for i in (6, 7):
            x, y = float(fa[i]), float(fb[i])
            assert abs(x - y) <= 1e-3 * max(1.0, abs(x)), (a, b)


def test_jax_engine_with_ctrl_and_exclusions(tmp_path):
    oracle.random_sam(str(tmp_path / "in.sam"), seed=72)
    oracle.random_sam(str(tmp_path / "c.sam"), seed=73,
                      cluster=False, n_pairs=150)
    (tmp_path / "x.bed").write_text("chr1\t2000\t9000\n")
    os.environ.update({"PALLAS_AXON_POOL_IPS": "",
                       "JAX_PLATFORMS": "cpu"})
    extra = ["-c", str(tmp_path / "c.sam"), "-E",
             str(tmp_path / "x.bed"), "-q", "0.5"]
    exact = _run(tmp_path, "exact", extra)
    fast = _run(tmp_path, "jax", extra + ["--engine", "jax"])
    # q-mode boundaries can shift by float noise at the threshold;
    # demand the same peak count and >90% identical coordinates
    assert abs(len(exact) - len(fast)) <= max(1, len(exact) // 10)
    same = sum(a.split("\t")[:3] == b.split("\t")[:3]
               for a, b in zip(exact, fast))
    assert same >= min(len(exact), len(fast)) * 0.9
