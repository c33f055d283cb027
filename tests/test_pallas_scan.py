"""Pallas fused coverage+p-value kernel vs the lax reference path."""

from __future__ import annotations

import numpy as np

import conftest  # noqa: F401
import jax.numpy as jnp

from genrich_tpu.ops.pallas_scan import BLOCK, coverage_pval_fused
from genrich_tpu.ops.pileup_jax import canon_value, pack_deltas
from genrich_tpu.ops.pvalue_jax import calc_pval


def test_fused_kernel_matches_lax():
    rng = np.random.RandomState(0)
    m = BLOCK * 4
    deltas = np.stack(
        [rng.randint(-1, 2, m), rng.randint(0, 8, m),
         rng.randint(0, 3, m), rng.randint(0, 5, m)],
        axis=-1).astype(np.int32)
    packed = pack_deltas(jnp.asarray(deltas))
    vals_ref = np.asarray(canon_value(
        jnp.cumsum(jnp.asarray(deltas), axis=0)))
    pval_ref = np.asarray(calc_pval(
        jnp.asarray(vals_ref), jnp.full(m, 2.5, np.float32)))

    vals, pval = coverage_pval_fused(packed, jnp.float32(2.5),
                                     interpret=True)
    # coverage is integer-exact arithmetic: must match bitwise;
    # transcendentals may differ by interpreter-mode ulps
    np.testing.assert_array_equal(np.asarray(vals), vals_ref)
    np.testing.assert_allclose(np.asarray(pval), pval_ref,
                               rtol=1e-5, atol=1e-5)
