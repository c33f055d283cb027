"""Multi-device sharding of the genome-tile pipeline.

The genome is cut into fixed-length tiles; tiles shard across a 1-D
``jax.sharding.Mesh`` (axis "tiles") with ``shard_map``.  The reference
has no parallelism at all (single-threaded C, SURVEY.md §2); the
shardable structure comes from its implicit axes: per-chromosome /
per-tile data parallelism for the pileup+stats sweeps, with three
global couplings implemented as collectives:

  - total weighted fragment length -> lambda: ``psum`` over tiles
    (savePileupExpt's global accumulator, Genrich.c:2168-2295);
  - inter-tile pileup carry: per-tile class-delta totals are
    ``all_gather``-ed and prefix-summed, the blockwise-scan carry for
    fragments spanning tile boundaries;
  - peaks straddling tile boundaries: each tile emits boundary run
    info; the (tiny) cross-boundary merge happens on the host.

On a real pod the "tiles" axis maps across ICI; tests use a virtual
8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.pipeline_jax import (TileResult, analyze_tile_core,
                                tile_class_totals)

AXIS = "tiles"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _local_step(start, end, count, tile_len, genome_len, min_pq,
                min_auc, min_len, max_gap):
    """Per-shard body (runs under shard_map over the 'tiles' axis).

    start/end/count: int32 [tiles_per_dev, E] local shard, positions
    tile-local.  Returns per-tile peaks plus the global lambda.
    """
    # global weighted fragment length -> lambda (psum collective)
    add = jnp.sum((end - start).astype(jnp.float32)
                  * jnp.where(count > 0, 1.0 / jnp.maximum(count, 1),
                              0.0), axis=1)
    local_frag = jnp.sum(add)
    total_frag = jax.lax.psum(local_frag, AXIS)
    lam = total_frag / genome_len

    # inter-tile carry: all_gather per-tile class totals, exclusive
    # prefix over the global tile order
    totals = jax.vmap(tile_class_totals)(start, end, count)  # [t, 4]
    all_totals = jax.lax.all_gather(totals, AXIS)            # [D, t, 4]
    d, t, _ = all_totals.shape
    flat = all_totals.reshape(d * t, 4)
    excl = jnp.concatenate([jnp.zeros((1, 4), flat.dtype),
                            jnp.cumsum(flat, axis=0)[:-1]])
    my = jax.lax.axis_index(AXIS)
    carries = jax.lax.dynamic_slice_in_dim(excl, my * t, t)   # [t, 4]

    res = jax.vmap(
        lambda s, e, c, cr: analyze_tile_core(
            s, e, c, tile_len, cr, lam, min_pq, min_auc,
            min_len, max_gap)
    )(start, end, count, carries)
    pk = res.peaks
    return (pk.start, pk.end, pk.auc, pk.summit_pval, pk.summit_qval,
            pk.summit_pos, pk.valid, res.frag_len, res.n_intervals,
            lam)


def sharded_analyze(mesh: Mesh, start, end, count, tile_len: int,
                    genome_len: int, min_pq: float, min_auc: float,
                    min_len: int = 0, max_gap: int = 100):
    """Run the tile pipeline sharded over the mesh.

    start/end/count: int32 [T, E] with T a multiple of the mesh size;
    positions are tile-local (caller splits events by tile, duplicating
    boundary-spanning fragments into both tiles' point lists).

    Returns (TileResult with [T, M] peak arrays, lambda).
    """
    from ..ops.peaks_jax import TilePeaks
    fn = jax.shard_map(
        partial(_local_step, tile_len=jnp.int32(tile_len),
                genome_len=jnp.float32(genome_len),
                min_pq=jnp.float32(min_pq),
                min_auc=jnp.float32(min_auc),
                min_len=min_len, max_gap=max_gap),
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS)),
        out_specs=tuple([P(AXIS)] * 9) + (P(),),
    )
    out = jax.jit(fn)(start, end, count)
    peaks = TilePeaks(*out[:7])
    return TileResult(peaks, out[7], out[8]), out[9]


def split_events_to_tiles(start: np.ndarray, end: np.ndarray,
                          count: np.ndarray, n_tiles: int,
                          tile_len: int, pad_to: Optional[int] = None):
    """Host-side: global events -> per-tile padded tile-local arrays.

    A fragment spanning tile boundaries contributes its start point to
    the tile containing it and its end point to that tile — the carry
    mechanism propagates the coverage between them.  Each point is
    emitted as a degenerate (p, p) pair plus the real one clipped?  No:
    points are independent in the diff-array model, so we simply route
    the add-point and sub-point to their own tiles as separate
    "events" whose other endpoint is clamped to the tile edge.
    """
    start = np.asarray(start, np.int64)
    end = np.asarray(end, np.int64)
    count = np.asarray(count, np.int32)
    ts = start // tile_len
    te = end // tile_len

    tiles_s = [[] for _ in range(n_tiles)]
    for i in range(len(start)):
        a, b = ts[i], min(te[i], n_tiles - 1)
        if a == b:
            tiles_s[a].append((start[i] - a * tile_len,
                               end[i] - a * tile_len, count[i]))
        else:
            tiles_s[a].append((start[i] - a * tile_len, tile_len,
                               count[i]))
            tiles_s[b].append((0, end[i] - b * tile_len, count[i]))

    e_max = pad_to or max(1, max(len(t) for t in tiles_s))
    out_s = np.full((n_tiles, e_max), tile_len, np.int32)
    out_e = np.full((n_tiles, e_max), tile_len, np.int32)
    out_c = np.zeros((n_tiles, e_max), np.int32)
    for t, evs in enumerate(tiles_s):
        for j, (s, e, c) in enumerate(evs[:e_max]):
            out_s[t, j] = s
            out_e[t, j] = e
            out_c[t, j] = c
    return out_s, out_e, out_c
