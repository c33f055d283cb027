"""MXU one-hot histogram vs numpy bincount."""

from __future__ import annotations

import numpy as np

import conftest  # noqa: F401
import jax.numpy as jnp

from genrich_tpu.ops.histogram import histogram_weighted


def test_histogram_matches_bincount():
    rng = np.random.RandomState(0)
    n = 100_000
    bins = rng.randint(0, 1 << 16, n).astype(np.int32)
    w = rng.uniform(0, 100, n).astype(np.float32)
    ours = np.asarray(histogram_weighted(jnp.asarray(bins),
                                         jnp.asarray(w)))
    ref = np.bincount(bins, weights=w.astype(np.float64),
                      minlength=1 << 16)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)
