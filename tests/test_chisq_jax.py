"""Device chi-squared combination vs the exact engine."""

from __future__ import annotations

import numpy as np

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from genrich_tpu.engine import chisq as ec
from genrich_tpu.ops import chisq_jax as oc


def test_pchisq_f64_matches_exact():
    rng = np.random.RandomState(0)
    jax.config.update("jax_enable_x64", True)
    try:
        for df in (4, 8, 40, 200, 400):
            xs = rng.uniform(0.01, 4 * df, 64)
            exact = ec.pchisq_neglog10(xs, np.full(64, df))
            dev = np.asarray(oc.pchisq_neglog10(
                jnp.asarray(xs, jnp.float64), df))
            np.testing.assert_allclose(dev, exact, rtol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_pchisq_f32_close():
    rng = np.random.RandomState(1)
    for df in (4, 20, 100):
        xs = rng.uniform(0.1, 3 * df, 64).astype(np.float32)
        exact = ec.pchisq_neglog10(xs.astype(np.float64),
                                   np.full(64, df))
        dev = np.asarray(oc.pchisq_neglog10(jnp.asarray(xs), df))
        np.testing.assert_allclose(dev, exact, rtol=5e-4, atol=5e-4)


def test_fisher_combine_matches_engine():
    rng = np.random.RandomState(2)
    m = 200
    r = 3
    pv = rng.uniform(0, 8, (r, m)).astype(np.float32)
    pv[0, :40] = -1.0          # SKIP lanes
    pv[:, 50:60] = -1.0        # fully-skipped intervals

    from genrich_tpu.engine.pileup import Pileup
    ends = np.arange(1, m + 1).astype(np.int64)
    piles = [Pileup(ends, pv[i]) for i in range(r)]
    exact = ec.combine_pvals(piles, m)

    dev = np.asarray(oc.fisher_combine(jnp.asarray(pv)))
    mask = exact.cov != np.float32(-1.0)
    np.testing.assert_allclose(dev[mask], exact.cov[mask], rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_array_equal(dev == -1.0,
                                  exact.cov == np.float32(-1.0))