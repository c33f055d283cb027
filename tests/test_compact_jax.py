"""Device-side compaction ops (ops/compact_jax.py), CPU-validated."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from genrich_tpu.ops import compact_jax  # noqa: E402

F32 = np.float32
SKIP = F32(-1.0)


def test_compact_packs_in_order():
    mask = jnp.asarray(np.array([0, 1, 0, 1, 1, 0], bool))
    vals = jnp.arange(6, dtype=jnp.int32) * 10
    (packed,), n = compact_jax.compact(mask, (vals,))
    assert int(n) == 3
    assert np.asarray(packed)[:3].tolist() == [10, 30, 40]


def test_rle_runs_matches_host_coalescing():
    # intervals: ends/pv with duplicates, zero-length rows, padding
    starts = np.array([0, 5, 5, 9, 12, 20, 20], np.int32)
    ends = np.array([5, 5, 9, 12, 20, 20, 20], np.int32)
    pv = np.array([1.0, 9.0, 1.0, 2.0, 2.0, 7.0, 0.0], F32)
    ev = np.array([1, 1, 2, 3, 3, 9, 0], F32)
    cr = np.array([0, 0, 1, 1, 1, 9, 0], F32)
    excluded = np.zeros(7, bool)
    live = np.array([1, 1, 1, 1, 1, 0, 0], bool)
    lam, factor = F32(0.5), F32(2.0)

    e_b, pv_b, ev_b, cv_b, b = jax.jit(compact_jax.rle_runs)(
        jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(pv),
        jnp.asarray(ev), jnp.asarray(cr), jnp.asarray(excluded),
        jnp.asarray(live), lam, factor)

    # host reference: drop zero-length + dead, coalesce equal pv
    real = live & (ends > starts)
    r_ends, r_pv, r_ev, r_cr = (a[real] for a in (ends, pv, ev, cr))
    brk = np.flatnonzero(np.diff(r_pv) != 0)
    last = np.append(brk, len(r_pv) - 1)
    nb = int(b)
    assert nb == len(last)
    assert np.asarray(e_b)[:nb].tolist() == r_ends[last].tolist()
    assert np.allclose(np.asarray(pv_b)[:nb], r_pv[last])
    assert np.allclose(np.asarray(ev_b)[:nb], r_ev[last])
    assert np.allclose(np.asarray(cv_b)[:nb],
                       np.maximum(factor * r_cr[last], lam))


def test_rle_runs_exclusion_values():
    starts = np.array([0, 10], np.int32)
    ends = np.array([10, 20], np.int32)
    pv = np.array([SKIP, 3.0], F32)
    ev = np.array([5.0, 2.0], F32)
    cr = np.array([4.0, 1.0], F32)
    excluded = np.array([1, 0], bool)
    live = np.ones(2, bool)
    e_b, pv_b, ev_b, cv_b, b = jax.jit(compact_jax.rle_runs)(
        *(jnp.asarray(a) for a in (starts, ends, pv, ev, cr,
                                   excluded, live)),
        F32(0.5), F32(1.0))
    assert int(b) == 2
    assert np.asarray(ev_b)[0] == 0.0          # expt zeroed in -E
    assert np.asarray(cv_b)[0] == SKIP         # ctrl SKIP in -E
    assert np.asarray(cv_b)[1] == F32(1.0)     # max(1*1, 0.5)


def test_distinct_pvals_sums_lengths():
    rng = np.random.RandomState(3)
    n = 257
    starts = np.arange(n, dtype=np.int32) * 10
    ends = starts + rng.randint(0, 10, n).astype(np.int32)
    pv = rng.choice([0.0, 1.5, 2.5, SKIP], n).astype(F32)
    live = rng.rand(n) < 0.9
    pv_d, w_d, d = jax.jit(compact_jax.distinct_pvals)(
        jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(pv),
        jnp.asarray(live))
    lens = ends - starts
    real = live & (lens > 0) & (pv != SKIP)
    exp = {}
    for v, l in zip(pv[real], lens[real]):
        exp[v] = exp.get(v, 0) + int(l)
    nd = int(d)
    got = dict(zip(np.asarray(pv_d)[:nd].tolist(),
                   np.asarray(w_d)[:nd].tolist()))
    assert got == {float(k): v for k, v in exp.items()}
    assert np.all(np.diff(np.asarray(pv_d)[:nd]) > 0)


def test_assign_qvals_lookup_and_skip():
    table_p = jnp.asarray(np.array([1.0, 2.0, 3.0, np.inf], F32))
    table_q = jnp.asarray(np.array([0.1, 0.2, 0.3, 0.0], F32))
    pv = jnp.asarray(np.array([2.0, SKIP, 3.0, 1.0], F32))
    q = np.asarray(compact_jax.assign_qvals(pv, table_p, table_q))
    assert np.allclose(q, [0.2, SKIP, 0.3, 0.1])


def test_peak_cap_fallback(tmp_path, monkeypatch):
    """Exceeding the device peak cap falls back to the host caller."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import oracle
    from genrich_tpu.engine import jax_bridge

    monkeypatch.setattr(jax_bridge, "PEAK_CAP", 2)
    oracle.random_sam(str(tmp_path / "in.sam"), seed=91)
    from genrich_tpu import cli
    d = tmp_path / "jaxout"
    d.mkdir()
    old = os.getcwd()
    os.chdir(d)
    try:
        rc = cli.main(["-t", str(tmp_path / "in.sam"), "-o", "out.np",
                       "-y", "-p", "0.01", "-a", "20",
                       "--engine", "jax"])
    finally:
        os.chdir(old)
    assert rc == 0
    lines = (d / "out.np").read_text().splitlines()
    assert len(lines) > 2  # more peaks than the cap -> host path ran
    r = oracle.run_ours(["-t", str(tmp_path / "in.sam"), "-o",
                         "exact.np", "-y", "-p", "0.01", "-a", "20"],
                        cwd=str(tmp_path))
    assert r.returncode == 0
    exact = (tmp_path / "exact.np").read_text().splitlines()
    assert [l.split("\t")[:6] for l in lines] \
        == [l.split("\t")[:6] for l in exact]
