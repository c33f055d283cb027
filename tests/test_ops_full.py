"""Full-feature device path (ctrl + exclusions + exact q) vs engine."""

from __future__ import annotations

import numpy as np

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from genrich_tpu.engine import pileup as ep, pvalue as epv
from genrich_tpu.ops.compact_jax import distinct_pvals_k
from genrich_tpu.ops.pipeline_jax import analyze_tile_ctrl


def _events(rng, n, length):
    start = rng.randint(0, length - 500, n).astype(np.int32)
    end = start + rng.randint(50, 400, n).astype(np.int32)
    count = rng.choice([1, 1, 2, 4], n).astype(np.int32)
    return start, end, count


def _expand_rle(ends, vals, length):
    """RLE (ends, vals) -> dense per-base float32 [length]."""
    lens = np.diff(np.concatenate([[0], np.asarray(ends, np.int64)]))
    out = np.repeat(np.asarray(vals, np.float32), lens)
    assert len(out) == length
    return out


def test_ctrl_tile_matches_engine():
    """Per-BASE comparison over the whole tile, FLT_MAX rows included."""
    rng = np.random.RandomState(0)
    length = 200_000
    es, ee, ec = _events(rng, 2000, length)
    cs, ce, cc = _events(rng, 1200, length)
    excl = np.array([[5000, 9000], [50_000, 61_000]], np.int32)
    lam = np.float32(1.3)
    factor = np.float32(1.7)

    (res, ctrl_frag, pval, starts, ends,
     live) = analyze_tile_ctrl(
        jnp.asarray(es), jnp.asarray(ee), jnp.asarray(ec),
        jnp.asarray(cs), jnp.asarray(ce), jnp.asarray(cc),
        jnp.asarray(excl), jnp.int32(length),
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        jnp.asarray(lam), jnp.asarray(factor),
        jnp.float32(1.5), jnp.float32(10.0), 0, 100)

    bed = [5000, 9000, 50_000, 61_000]
    e_pu, terms = ep.expt_pileup(es.astype(np.int64),
                                 ee.astype(np.int64),
                                 ec.astype(np.int64), length, bed)
    c_pu = ep.ctrl_pileup(cs.astype(np.int64), ce.astype(np.int64),
                          cc.astype(np.int64), length, bed, factor,
                          lam)
    pv_ref = epv.pval_pileup(e_pu, c_pu)
    dense_ref = _expand_rle(pv_ref.end, pv_ref.cov, length)

    starts_np = np.asarray(starts)
    ends_np = np.asarray(ends)
    pv_np = np.asarray(pval)
    keep = np.asarray(live) & (ends_np > starts_np)
    order = np.argsort(starts_np[keep], kind="stable")
    dense_dev = np.repeat(pv_np[keep][order],
                          (ends_np[keep] - starts_np[keep])[order])
    assert len(dense_dev) == length

    skip_ref = dense_ref == np.float32(-1.0)
    np.testing.assert_array_equal(dense_dev == np.float32(-1.0),
                                  skip_ref)
    big_ref = dense_ref >= np.float32(1e30)
    assert (dense_dev[big_ref] >= np.float32(1e30)).all()
    fin = ~skip_ref & ~big_ref
    np.testing.assert_allclose(dense_dev[fin], dense_ref[fin],
                               rtol=2e-3, atol=2e-4)

    # weighted fragment length matches engine's
    frag_ref = float(np.sum(terms.astype(np.float64)))
    assert abs(float(res.frag_len) - frag_ref) / max(frag_ref, 1) < 1e-5


def test_distinct_k_plus_exact_sweep_matches_engine():
    """Device distinct (p, bp) -> host exact BH == engine q-values,
    byte-for-byte (the sharded path's q computation)."""
    from genrich_tpu.engine.pileup import Pileup
    from genrich_tpu.engine.qvalue import collect_pvals, qvalues
    from genrich_tpu.parallel.mesh import exact_q_table

    rng = np.random.RandomState(2)
    n = 5000
    # quantized p pool (the real pipeline's p-values are quantized by
    # the fraction classes) + FLT_MAX and SKIP rows
    pool = np.abs(rng.standard_normal(200)).astype(np.float32) * 3
    pv = pool[rng.randint(0, 200, n)]
    pv[rng.rand(n) < 0.01] = np.float32(3.4028235e38)
    pv[rng.rand(n) < 0.05] = np.float32(-1.0)   # SKIP
    lens = rng.randint(1, 500, n).astype(np.int64)
    ends = np.cumsum(lens)
    starts = np.concatenate([[0], ends[:-1]])
    genome = int(lens[pv != np.float32(-1.0)].sum())

    k = 1 << 10
    pv_k, w_k, d = distinct_pvals_k(
        jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32),
        jnp.asarray(pv), jnp.ones(n, bool), k)
    tab_p, tab_q, total_bp, _ = exact_q_table(
        np.asarray(pv_k), np.asarray(w_k),
        np.asarray(d).reshape(1), k, genome)
    assert total_bp == genome

    exact_pd, exact_pl = collect_pvals([Pileup(ends, pv)])
    q_exact = qvalues(exact_pd, exact_pl, genome)
    nd = int(np.asarray(d))
    assert nd == len(exact_pd)
    np.testing.assert_array_equal(tab_p[:nd], exact_pd)
    np.testing.assert_array_equal(tab_q[:nd], q_exact)


def test_distinct_k_overflow_raises():
    from genrich_tpu.parallel.mesh import exact_q_table
    import pytest
    with pytest.raises(ValueError, match="overflow"):
        exact_q_table(np.zeros(8, np.float32), np.zeros(8, np.int32),
                      np.array([9]), 8, 1000)
