"""Device pileup: sorted events -> interval coverage values.

The reference's per-base diff-array sweep (savePileupExpt,
Genrich.c:2168-2295) becomes sort + cumulative-sum + canonicalize (see
engine/pileup.py for the derivation of the class-separated integer
encoding).  O(events log events) instead of O(genome length), with
fully static shapes: events are padded to a fixed size with
pos = tile_len and zero deltas, so padding sorts to the end and never
perturbs the cumulative sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

# per-class raw contributions indexed by count N (see engine/pileup.py)
# (numpy at module level: jnp constants would initialize the backend
# on import, breaking non-jax CLI paths)
_ADD = np.array([
    # cov e8 s6 t10
    [0, 0, 0, 0], [1, 0, 0, 0], [0, 4, 0, 0], [0, 0, 2, 0],
    [0, 2, 0, 0], [0, 0, 0, 2], [0, 0, 1, 0], [0, 0, 0, 0],
    [0, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1]], np.int32)
_SUB = np.array([
    [0, 0, 0, 0], [-1, 0, 0, 0], [-1, 4, 0, 0], [-1, 4, 1, 0],
    [-1, 6, 0, 0], [-1, 4, 0, 3], [-1, 4, 2, 0], [0, 0, 0, 0],
    [-1, 7, 0, 0], [0, 0, 0, 0], [-1, 4, 0, 4]], np.int32)


def event_deltas(count: jnp.ndarray):
    """Map event count codes to (add, sub) class-delta rows."""
    add = jnp.asarray(_ADD)
    sub = jnp.asarray(_SUB)
    return add[count], sub[count]


def canon_value(cum: jnp.ndarray) -> jnp.ndarray:
    """Canonical float32 value from cumulative class sums [..., 4].

    Replicates getVal (Genrich.c:1902-1907): left-associated f32
    additions of cov + e/8 + s/6 + t/10 after carry normalization.
    """
    cov, e8, s6, t10 = (cum[..., 0], cum[..., 1], cum[..., 2],
                        cum[..., 3])
    halves = e8 // 4 + s6 // 3 + t10 // 5
    covc = cov + halves // 2
    e = e8 % 4 + 4 * (halves % 2)
    s = s6 % 3
    t = t10 % 5
    v = covc.astype(jnp.float32)
    v = v + e.astype(jnp.float32) / jnp.float32(8.0)
    v = v + s.astype(jnp.float32) / jnp.float32(6.0)
    v = v + t.astype(jnp.float32) / jnp.float32(10.0)
    return v


def pack_deltas(deltas: jnp.ndarray) -> jnp.ndarray:
    """Pack 4 (or 8) delta channels into one int32 payload.

    Field widths: cov+1 in 2 bits, e8 in 3, s6 in 2, t10 in 3 — 10
    bits per 4-channel set, so an expt+ctrl pair fits in 20 bits.
    Halves the sort operand count (the sort dominates tile time).
    """
    n = deltas.shape[-1] // 4
    packed = jnp.zeros(deltas.shape[:-1], jnp.int32)
    for g in range(n):
        b = deltas[..., 4 * g:4 * g + 4]
        grp = ((b[..., 0] + 1) | (b[..., 1] << 2) | (b[..., 2] << 5)
               | (b[..., 3] << 7))
        packed = packed | (grp << (10 * g))
    return packed


def unpack_deltas(packed: jnp.ndarray, groups: int = 1) -> jnp.ndarray:
    chans = []
    for g in range(groups):
        grp = (packed >> (10 * g)) & 0x3FF
        chans += [(grp & 3) - 1, (grp >> 2) & 7, (grp >> 5) & 3,
                  (grp >> 7) & 7]
    return jnp.stack(chans, axis=-1)


def sort_events(pos: jnp.ndarray, deltas: jnp.ndarray):
    """Sort events by position, carrying the 4 delta channels.

    pos: int32 [M]; deltas: int32 [M, 4].  Returns sorted (pos, deltas).
    """
    pos_s, packed_s = jax.lax.sort((pos, pack_deltas(deltas)),
                                   num_keys=1, is_stable=False)
    return pos_s, unpack_deltas(packed_s, 1)


def interval_values(pos: jnp.ndarray, deltas: jnp.ndarray,
                    tile_len: jnp.ndarray):
    """Sorted events -> per-interval (start, end, value).

    Interval i spans [pos_i, pos_{i+1}) with the coverage value after
    applying events 0..i; a final interval extends to tile_len.
    Zero-length intervals (duplicate positions) are retained with
    length 0 and must be masked by consumers.
    """
    cum = jnp.cumsum(deltas, axis=0)
    vals = canon_value(cum)
    starts = pos
    ends = jnp.concatenate([pos[1:], jnp.full((1,), tile_len,
                                              pos.dtype)])
    return starts, ends, vals


def fragment_length_sum(starts, ends, vals) -> jnp.ndarray:
    """Total weighted fragment length: sum((end-start) * val) in f32."""
    lens = (ends - starts).astype(jnp.float32)
    return jnp.sum(lens * vals)
