"""Device peak calling: vectorized gap-join over significance runs.

Reformulates the sequential state machine (callPeaks, Genrich.c:
977-1069) as masked scans + segment reductions: each significant
interval links to the previous one iff the gap is within maxGap and no
SKIP interval lies between (SKIP hard-breaks); connected components
become peaks, reduced with segment sum/min/max for AUC, bounds, and
the summit (first interval at the maximal statistic; summit position
from the first longest such interval).  Fully jittable, static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**31 - 1)
SKIP = jnp.float32(-1.0)


class TilePeaks(NamedTuple):
    start: jnp.ndarray      # int32 [M]
    end: jnp.ndarray        # int32 [M]
    auc: jnp.ndarray        # f32 [M]
    summit_pval: jnp.ndarray
    summit_qval: jnp.ndarray
    summit_pos: jnp.ndarray  # int32 [M]
    valid: jnp.ndarray      # bool [M]


def call_peaks(starts, ends, stat, pval, qval, live, min_pq, min_auc,
               min_len, max_gap) -> TilePeaks:
    """Peak calling over one tile's intervals (padded to M).

    live masks real intervals; zero-length intervals are ignored.
    Returns per-segment peak records with a validity mask (at most one
    peak can begin per interval, so M segments suffice).
    """
    m = starts.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    lens = ends - starts
    live = live & (lens > 0)
    sig = live & (stat > min_pq)
    skp = live & (stat == SKIP)

    # previous significant interval's end / skip-count at it
    neg = jnp.int32(-1)
    end_at_sig = jnp.where(sig, ends, neg)
    prev_end_inc = jax.lax.cummax(end_at_sig)
    prev_end = jnp.concatenate([jnp.full((1,), neg), prev_end_inc[:-1]])
    has_prev = prev_end >= 0

    skip_cum = jnp.cumsum(skp.astype(jnp.int32))
    sc_at_sig = jnp.where(sig, skip_cum, neg)
    prev_sc_inc = jax.lax.cummax(sc_at_sig)
    prev_sc = jnp.concatenate([jnp.full((1,), neg), prev_sc_inc[:-1]])

    join = (sig & has_prev & (starts - prev_end <= max_gap)
            & (skip_cum - prev_sc == 0))
    new_peak = sig & ~join
    pid = jnp.cumsum(new_peak.astype(jnp.int32)) - 1
    seg = jnp.where(sig, pid, m - 1)

    lens_f = lens.astype(jnp.float32)
    contrib = jnp.where(sig, lens_f * (stat - min_pq), 0.0)
    auc = jax.ops.segment_sum(contrib, seg, num_segments=m)
    p_start = jax.ops.segment_min(jnp.where(sig, starts, _BIG), seg,
                                  num_segments=m)
    p_end = jax.ops.segment_max(jnp.where(sig, ends, -_BIG), seg,
                                num_segments=m)
    n_sig = jax.ops.segment_sum(sig.astype(jnp.int32), seg,
                                num_segments=m)

    stat_masked = jnp.where(sig, stat, -jnp.inf)
    max_stat = jax.ops.segment_max(stat_masked, seg, num_segments=m)
    at_max = sig & (stat == max_stat[seg])
    first_max = jax.ops.segment_min(jnp.where(at_max, idx, _BIG), seg,
                                    num_segments=m)
    max_len = jax.ops.segment_max(jnp.where(at_max, lens, -_BIG), seg,
                                  num_segments=m)
    at_maxlen = at_max & (lens == max_len[seg])
    pos_idx = jax.ops.segment_min(jnp.where(at_maxlen, idx, _BIG), seg,
                                  num_segments=m)

    fm = jnp.clip(first_max, 0, m - 1)
    pi = jnp.clip(pos_idx, 0, m - 1)
    summit_pval = pval[fm]
    summit_qval = qval[fm]
    summit_pos = (starts[pi] + ends[pi]) // 2 - p_start

    exists = n_sig > 0
    # the dummy segment (m-1) may mix padding; require a real first peak
    exists = exists & (jnp.arange(m) < pid[-1] + 1)
    valid = (exists & (auc >= min_auc)
             & ((p_end - p_start) >= min_len))
    return TilePeaks(p_start, p_end, auc, summit_pval, summit_qval,
                     summit_pos, valid)
