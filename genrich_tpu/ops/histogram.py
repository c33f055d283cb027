"""Weighted histogram via one-hot matmuls (MXU-friendly, no scatter).

TPU scatters serialize; a 2^16-bin histogram decomposes into two
256-way digits, so the bin-count becomes two one-hot contractions that
run on the MXU:

    hist2d[h, l] = sum_i w_i [hi_i = h][lo_i = l]
                 = onehot(hi)^T @ (w * onehot(lo))

evaluated in chunks to bound the one-hot memory.  Used for the
genome-wide BH q-value histogram in the sharded fast path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_bins", "chunk"))
def histogram_weighted(bins: jnp.ndarray, weights: jnp.ndarray,
                       n_bins: int = 1 << 16,
                       chunk: int = 1 << 15) -> jnp.ndarray:
    """Sum of weights per bin; bins int32 in [0, n_bins)."""
    assert n_bins == 1 << 16, "two-digit decomposition expects 2^16"
    bins = bins.reshape(-1)
    weights = weights.reshape(-1).astype(jnp.float32)
    n = bins.shape[0]
    pad = (-n) % chunk
    if pad:
        bins = jnp.concatenate([bins, jnp.zeros(pad, bins.dtype)])
        weights = jnp.concatenate([weights,
                                   jnp.zeros(pad, jnp.float32)])
    bins_c = bins.reshape(-1, chunk)
    w_c = weights.reshape(-1, chunk)

    def body(_, xs):
        b, w = xs
        hi = (b >> 8).astype(jnp.int32)
        lo = (b & 255).astype(jnp.int32)
        oh_hi = jax.nn.one_hot(hi, 256, dtype=jnp.float32)
        oh_lo = jax.nn.one_hot(lo, 256, dtype=jnp.float32)
        h = jnp.dot(oh_hi.T, w[:, None] * oh_lo,
                    preferred_element_type=jnp.float32)
        # per-chunk outputs summed afterwards: a zero init carry would
        # clash with shard_map's varying-manual-axes tracking
        return 0, h

    _, hists = jax.lax.scan(body, 0, (bins_c, w_c))
    return jnp.sum(hists, axis=0).reshape(-1)
