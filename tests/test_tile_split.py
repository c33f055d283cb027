"""Property tests for the vectorized host-side tile splitter.

The splitter must route every event's coverage into per-tile local
event lists exactly — including fragments spanning any number of
tiles — with no Python per-event loop and no silent truncation.
"""

from __future__ import annotations

import numpy as np
import pytest

import conftest  # noqa: F401

from genrich_tpu.parallel.mesh import split_events_to_tiles

# class-delta tables mirrored from ops/pileup_jax.py
from genrich_tpu.ops.pileup_jax import _ADD, _SUB, canon_value


def _dense_class_sums(start, end, count, length):
    """Per-base cumulative class sums [length, 4] from global events."""
    diff = np.zeros((length + 1, 4), np.int64)
    np.add.at(diff, start, _ADD[count].astype(np.int64))
    np.add.at(diff, end, _SUB[count].astype(np.int64))
    return np.cumsum(diff[:-1], axis=0)


def _dense_from_tiles(ts, te, tc, n_tiles, tile_len):
    """Per-base class sums reconstructed tile by tile (carry-free)."""
    out = np.zeros((n_tiles * tile_len, 4), np.int64)
    for t in range(n_tiles):
        live = tc[t] != 0
        s = ts[t][live]
        e = te[t][live]
        c = tc[t][live]
        diff = np.zeros((tile_len + 1, 4), np.int64)
        np.add.at(diff, s, _ADD[c].astype(np.int64))
        np.add.at(diff, e, _SUB[c].astype(np.int64))
        out[t * tile_len:(t + 1) * tile_len] = \
            np.cumsum(diff[:-1], axis=0)
    return out


def _random_events(rng, n, length, max_frag):
    start = rng.randint(0, length - 1, n).astype(np.int64)
    frag = rng.randint(1, max_frag, n)
    end = np.minimum(start + frag, length)
    count = rng.choice([1, 1, 1, 2, 3, 4, 5, 6, 8, 10], n) \
        .astype(np.int32)
    return start, end, count


@pytest.mark.parametrize("max_frag", [300, 5000, 40000])
def test_split_coverage_exact(max_frag):
    """Tile-local events reproduce the global coverage per base,
    including fragments spanning 2, 3, and many tiles."""
    n_tiles, tile_len = 16, 1 << 12
    length = n_tiles * tile_len
    rng = np.random.RandomState(max_frag)
    start, end, count = _random_events(rng, 3000, length, max_frag)
    ts, te, tc = split_events_to_tiles(start, end, count, n_tiles,
                                       tile_len)
    want = _dense_class_sums(start, end, count, length)
    got = _dense_from_tiles(ts, te, tc, n_tiles, tile_len)
    # raw class sums differ across a split (add/sub rows are not
    # negations), but their canonical values — the only thing any
    # consumer reads — are identical per base
    np.testing.assert_array_equal(np.asarray(canon_value(got)),
                                  np.asarray(canon_value(want)))
    # every add+sub row pair is canon-neutral, so each tile's class
    # totals (the inter-tile carry) reduce to canonical zero
    for t in range(n_tiles):
        live = tc[t] != 0
        tot = (_ADD[tc[t][live]].sum(0)
               + _SUB[tc[t][live]].sum(0)).astype(np.int64)
        assert float(np.asarray(canon_value(tot))) == 0.0


def test_split_whole_genome_fragment():
    """A single fragment spanning every tile covers all bases."""
    n_tiles, tile_len = 8, 1024
    ts, te, tc = split_events_to_tiles(
        np.array([0]), np.array([n_tiles * tile_len]),
        np.array([1], np.int32), n_tiles, tile_len)
    got = _dense_from_tiles(ts, te, tc, n_tiles, tile_len)
    np.testing.assert_array_equal(got[:, 0], 1)


def test_split_boundary_exact_end():
    """Fragments ending exactly on a tile boundary stay one piece."""
    n_tiles, tile_len = 4, 1000
    ts, te, tc = split_events_to_tiles(
        np.array([500, 1000]), np.array([1000, 2000]),
        np.array([1, 2], np.int32), n_tiles, tile_len)
    assert (tc[0] != 0).sum() == 1 and ts[0][0] == 500 \
        and te[0][0] == 1000
    assert (tc[1] != 0).sum() == 1 and ts[1][0] == 0 \
        and te[1][0] == 1000
    assert (tc[2] != 0).sum() == 0


def test_split_overflow_policies():
    n_tiles, tile_len = 2, 1000
    start = np.zeros(10, np.int64)
    end = np.full(10, 5, np.int64)
    count = np.ones(10, np.int32)
    # grow (default): widens past pad_to, keeps every event
    ts, te, tc = split_events_to_tiles(start, end, count, n_tiles,
                                       tile_len, pad_to=4)
    assert tc.shape[1] == 10 and (tc[0] != 0).sum() == 10
    # error: shape-locked callers get a loud failure, not truncation
    with pytest.raises(ValueError, match="overflow"):
        split_events_to_tiles(start, end, count, n_tiles, tile_len,
                              pad_to=4, on_overflow="error")


def test_split_rejects_bad_events():
    with pytest.raises(ValueError):
        split_events_to_tiles(np.array([5]), np.array([5]),
                              np.array([1], np.int32), 2, 100)
    with pytest.raises(ValueError):
        split_events_to_tiles(np.array([250]), np.array([260]),
                              np.array([1], np.int32), 2, 100)


def test_split_empty():
    ts, te, tc = split_events_to_tiles(np.zeros(0), np.zeros(0),
                                       np.zeros(0, np.int32), 3, 100,
                                       pad_to=8)
    assert ts.shape == (3, 8) and (tc == 0).all() \
        and (ts == 100).all()


def test_split_scales():
    """1e6 events (some multi-tile) split without per-event Python."""
    import time
    n_tiles, tile_len = 256, 1 << 20
    rng = np.random.RandomState(0)
    n = 1_000_000
    start, end, count = _random_events(rng, n, n_tiles * tile_len,
                                       2_000_000)
    t0 = time.perf_counter()
    ts, te, tc = split_events_to_tiles(start, end, count, n_tiles,
                                       tile_len)
    dt = time.perf_counter() - t0
    assert (tc != 0).sum() >= n        # pieces >= events
    assert dt < 10.0                   # vectorized: ~0.1s typical


def _split_excl_loop(bed, n_tiles, tile_len):
    """Reference loop implementation of split_excl_to_tiles (the
    pre-vectorization version, kept as the property-test oracle)."""
    per_tile = [[] for _ in range(n_tiles)]
    for i in range(0, len(bed), 2):
        a, b = bed[i], bed[i + 1]
        t0 = a // tile_len
        t1 = min((b - 1) // tile_len, n_tiles - 1) if b > a else t0
        for t in range(max(t0, 0), min(t1, n_tiles - 1) + 1):
            lo = max(a - t * tile_len, 0)
            hi = min(b - t * tile_len, tile_len)
            if hi > lo:
                per_tile[t].append((lo, hi))
    k = 1
    while k < max(1, max(len(x) for x in per_tile)):
        k <<= 1
    out = np.full((n_tiles, k, 2), tile_len, np.int32)
    for t, pairs in enumerate(per_tile):
        for j, (lo, hi) in enumerate(pairs):
            out[t, j] = (lo, hi)
    return out


@pytest.mark.parametrize("seed,density", [(0, 50), (1, 2000),
                                          (2, 200000)])
def test_split_excl_matches_loop(seed, density):
    """Vectorized -E splitter == loop oracle, up to find_ns-scale
    density (1-bp pairs at hundreds of thousands of rows)."""
    from genrich_tpu.parallel.mesh import split_excl_to_tiles
    n_tiles, tile_len = 16, 1 << 12
    genome = n_tiles * tile_len
    rng = np.random.RandomState(seed)
    a = np.sort(rng.randint(0, genome - 1, density))
    width = rng.choice([1, 1, 1, 5, 100, 9000], density)
    b = np.minimum(a + width, genome)
    bed = np.empty(2 * density, np.int64)
    bed[0::2] = a
    bed[1::2] = b
    got = split_excl_to_tiles(bed, n_tiles, tile_len)
    want = _split_excl_loop(list(bed), n_tiles, tile_len)
    np.testing.assert_array_equal(got, want)


def test_split_excl_edges():
    from genrich_tpu.parallel.mesh import split_excl_to_tiles
    # empty bed, empty pair (b <= a), pair past the grid, boundary pair
    assert split_excl_to_tiles([], 3, 100).shape == (3, 1, 2)
    got = split_excl_to_tiles([5, 5, 350, 360, 90, 210], 3, 100)
    want = _split_excl_loop([5, 5, 350, 360, 90, 210], 3, 100)
    np.testing.assert_array_equal(got, want)


def test_stage_events_flat_wire_roundtrip():
    """ShardedEngine._stage_events must reproduce the padded [T, w]
    triple exactly through the flat+offsets wire (both the uint16-
    length and int32-end encodings, including the all-padding empty
    case the no-ctrl cache stages)."""
    from genrich_tpu.engine.sharded_bridge import ShardedEngine
    from genrich_tpu.parallel.mesh import split_events_to_tiles

    eng = ShardedEngine(n_devices=1)
    tile_len, n_tiles, w = 1 << 12, 8, 64
    rng = np.random.RandomState(3)
    n = 200
    s = np.sort(rng.randint(0, n_tiles * tile_len - 40, n).astype(
        np.int64))
    e = s + rng.randint(1, 5000, n)
    e = np.minimum(e, n_tiles * tile_len)
    c = rng.randint(1, 11, n).astype(np.int64)
    ts, te, tc = split_events_to_tiles(s, e, c, n_tiles, tile_len)

    def expect(ts, te, tc):
        out_s = np.full((n_tiles, w), tile_len, np.int32)
        out_e = np.full((n_tiles, w), tile_len, np.int32)
        out_c = np.zeros((n_tiles, w), np.uint8)
        wn = ts.shape[1]
        out_s[:, :wn] = ts
        out_e[:, :wn] = te
        out_c[:, :wn] = tc
        out_c[out_s == tile_len] = 0
        return out_s, out_e, out_c

    for triple in ((ts, te, tc),
                   (np.full((n_tiles, 0), tile_len, np.int64),) * 3):
        a, b, cc = triple
        ds, de, dc = (np.asarray(x) for x in eng._stage_events(
            a, b, cc, w, tile_len))
        es, ee, ec = expect(a, b, cc)
        np.testing.assert_array_equal(ds, es)
        np.testing.assert_array_equal(de, ee)
        np.testing.assert_array_equal(dc, ec)

    # int32 path: one piece longer than 2^16
    e2 = e.copy()
    s2 = s.copy()
    s2[0], e2[0] = 0, (1 << 12) * 8  # full-grid cover in every tile
    ts2, te2, tc2 = split_events_to_tiles(s2, e2, c, n_tiles,
                                          tile_len)
    # piece length here is tile_len (4096) < 2^16; force the int32
    # branch by using a bigger grid instead
    big_tl = 1 << 18
    ts3, te3, tc3 = split_events_to_tiles(
        np.array([0], np.int64), np.array([big_tl], np.int64),
        np.array([1], np.int64), 2, big_tl)
    ds, de, dc = (np.asarray(x) for x in eng._stage_events(
        ts3, te3, tc3, 4, big_tl))
    assert ds[0, 0] == 0 and de[0, 0] == big_tl and dc[0, 0] == 1
    assert (ds[0, 1:] == big_tl).all() and (dc[1] == 0).all()
