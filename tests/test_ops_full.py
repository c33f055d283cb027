"""Full-feature device path (ctrl + exclusions + binned q) vs engine."""

from __future__ import annotations

import numpy as np

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from genrich_tpu.engine import pileup as ep, pvalue as epv
from genrich_tpu.ops.pipeline_jax import (analyze_tile_ctrl,
                                          qvalues_binned,
                                          qvalues_from_hist)


def _events(rng, n, length):
    start = rng.randint(0, length - 500, n).astype(np.int32)
    end = start + rng.randint(50, 400, n).astype(np.int32)
    count = rng.choice([1, 1, 2, 4], n).astype(np.int32)
    return start, end, count


def test_ctrl_tile_matches_engine():
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

    # device p-values at engine interval midpoints must agree closely
    starts_np = np.asarray(starts)
    ends_np = np.asarray(ends)
    pv_np = np.asarray(pval)
    ref_starts = np.concatenate([[0], pv_ref.end[:-1]])
    sel = np.random.RandomState(1).choice(len(pv_ref.end), 200,
                                          replace=False)
    for j in sel:
        mid = (ref_starts[j] + pv_ref.end[j]) // 2
        k = np.searchsorted(starts_np, mid, side="right") - 1
        if k < 0 or starts_np[k] >= ends_np[k]:
            continue
        a, b = pv_np[k], pv_ref.cov[j]
        if b == np.float32(-1.0):
            assert a == np.float32(-1.0), (mid, a, b)
        elif b < 1e30:
            assert abs(a - b) <= 2e-3 * max(1.0, abs(b)), (mid, a, b)

    # weighted fragment length matches engine's
    frag_ref = float(np.sum(terms.astype(np.float64)))
    assert abs(float(res.frag_len) - frag_ref) / max(frag_ref, 1) < 1e-5


def test_binned_qvalues_close_to_exact():
    rng = np.random.RandomState(2)
    n = 5000
    pv = np.abs(rng.standard_normal(n)).astype(np.float32) * 3
    lens = rng.randint(1, 500, n).astype(np.int32)
    genome = int(lens.sum())

    hist, bins = qvalues_binned(jnp.asarray(pv), jnp.asarray(lens),
                                jnp.ones(n, bool), genome)
    qb = qvalues_from_hist(hist, genome)
    q_dev = np.asarray(qb)[np.asarray(bins)]

    from genrich_tpu.engine.pileup import Pileup
    ends = np.cumsum(lens.astype(np.int64))
    exact_pd, exact_pl = __import__(
        "genrich_tpu.engine.qvalue", fromlist=["collect_pvals"]
    ).collect_pvals([Pileup(ends, pv)])
    from genrich_tpu.engine.qvalue import qvalues
    q_exact_tab = qvalues(exact_pd, exact_pl, genome)
    idx = np.searchsorted(exact_pd, pv)
    q_exact = q_exact_tab[idx]

    ok = np.abs(q_dev - q_exact) <= 0.02 + 0.02 * np.abs(q_exact)
    assert ok.mean() > 0.99, (1 - ok.mean())
