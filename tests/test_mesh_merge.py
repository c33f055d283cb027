"""Cross-tile peak merging: sharded + merge == single-device peaks."""

from __future__ import annotations

import numpy as np

import conftest  # noqa: F401
import jax
import jax.numpy as jnp

from genrich_tpu.ops.pipeline_jax import analyze_tile
from genrich_tpu.parallel import mesh as pmesh


def _single(start, end, count, length, lam):
    res = analyze_tile(jnp.asarray(start), jnp.asarray(end),
                       jnp.asarray(count), jnp.int32(length),
                       jnp.float32(lam), jnp.float32(2.0),
                       jnp.float32(20.0), 0, 100)
    v = np.asarray(res.peaks.valid)
    return sorted((int(a), int(b)) for a, b in
                  zip(np.asarray(res.peaks.start)[v],
                      np.asarray(res.peaks.end)[v]))


def test_boundary_straddling_peak():
    length = 8 * 4096
    L = 4096
    rng = np.random.RandomState(3)
    # background + a dense cluster straddling the tile-3/4 boundary
    n_bg = 2000
    start = rng.randint(0, length - 300, n_bg)
    cluster = rng.randint(3 * L + 3600, 4 * L + 400, 800)
    start = np.concatenate([start, cluster]).astype(np.int32)
    end = (start + rng.randint(80, 300, len(start))).astype(np.int32)
    end = np.minimum(end, length).astype(np.int32)
    count = np.ones(len(start), np.int32)

    lam = float((end - start).sum()) / length
    single = _single(start, end, count, length, lam)
    assert any(s < 4 * L < e for (s, e) in single), \
        "fixture must produce a boundary-straddling peak"

    m = pmesh.make_mesh()
    ts, te, tc = pmesh.split_events_to_tiles(start, end, count, 8, L)
    res, lam8 = pmesh.sharded_analyze(
        m, jnp.asarray(ts), jnp.asarray(te), jnp.asarray(tc), L,
        length, 2.0, 20.0, 0, 100)
    merged = pmesh.merge_tile_peaks(res, L, 20.0, 0, 100)
    got = sorted((int(s), int(e)) for (s, e, *_rest) in merged)
    assert got == single
