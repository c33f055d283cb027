"""Benchmark: genome-scan throughput of the device numeric pipeline.

Replicates the scale of the reference's sole published benchmark
(README.md:459-511: hg19, 2.83 Gbp scanned in 10.5 min single-core,
about 4.5M genome positions/s) on the numeric phase: fragment events ->
pileup -> log-normal p-values -> peak calling, as the fused device
kernel, tile by tile across a human-sized genome.

Prints one JSON line: genome positions scanned per second,
vs_baseline = ratio over the reference's implied 4.5e6 positions/s.
The line also carries an "e2e" key: measured wall times of the
compiled reference vs our CLI engines on a multi-million-record BGZF
BAM (scripts/bench_e2e.py) — the honest end-to-end ratio on this
machine, not the kernel-only number.  GENRICH_BENCH_E2E=0 skips it;
GENRICH_BENCH_E2E_PAIRS sizes it (default 2M pairs ~ 4.9M records).
"""

from __future__ import annotations

import os
import json
import sys
import time

import numpy as np

GENOME_LEN = 2_826_865_605          # reference example (README.md:490)
BASELINE_POS_PER_SEC = 4.5e6        # derived: README.md:490,496
TILE_LEN = 1 << 24                  # 16.8 Mbp tiles
EVENTS_PER_TILE = 1 << 19           # ~88M fragments genome-wide


def main() -> None:
    from genrich_tpu.utils.xla_cache import enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from genrich_tpu.ops.pipeline_jax import analyze_tile

    n_tiles = (GENOME_LEN + TILE_LEN - 1) // TILE_LEN

    rng = np.random.RandomState(0)
    variants = []
    for _ in range(4):   # distinct per-tile event sets, cycled
        hot = rng.randint(0, TILE_LEN - 2000, 64)
        which = rng.randint(0, 64, EVENTS_PER_TILE)
        is_hot = rng.rand(EVENTS_PER_TILE) < 0.7
        base = np.where(is_hot,
                        hot[which] + rng.randint(0, 1500,
                                                 EVENTS_PER_TILE),
                        rng.randint(0, TILE_LEN - 500,
                                    EVENTS_PER_TILE))
        frag = rng.randint(80, 400, EVENTS_PER_TILE)
        start = np.clip(base, 0, TILE_LEN - 1).astype(np.int32)
        end = np.clip(base + frag, 1, TILE_LEN).astype(np.int32)
        count = rng.choice([1, 1, 1, 1, 2, 4], EVENTS_PER_TILE) \
            .astype(np.int32)
        variants.append((jnp.asarray(start), jnp.asarray(end),
                         jnp.asarray(count)))
    lam = np.float32(EVENTS_PER_TILE * 200.0 / TILE_LEN)

    def step(i):
        s, e, c = variants[i % len(variants)]
        return analyze_tile(s, e, c,
                            jnp.int32(TILE_LEN), jnp.float32(lam),
                            jnp.float32(2.0), jnp.float32(20.0),
                            0, 100)

    # warmup / compile
    res = step(0)
    jax.block_until_ready(res)

    t0 = time.perf_counter()
    acc = None
    for i in range(n_tiles):
        res = step(i)
        acc = res.frag_len if acc is None else acc + res.frag_len
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    value = GENOME_LEN / dt
    out = {
        "metric": "genome_positions_per_sec",
        "value": round(value, 1),
        "unit": "positions/s",
        "vs_baseline": round(value / BASELINE_POS_PER_SEC, 3),
    }
    if os.environ.get("GENRICH_BENCH_E2E", "1") != "0":
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            from bench_e2e import bench_e2e
            n_pairs = int(os.environ.get("GENRICH_BENCH_E2E_PAIRS",
                                         "2000000"))
            out["e2e"] = bench_e2e(n_pairs, include_jax=True,
                                   timeout=900.0)
        except Exception as exc:  # the e2e leg must never kill bench
            out["e2e"] = {"error": f"{type(exc).__name__}: {exc}"}
    print(json.dumps(out))
    print(f"# {n_tiles} tiles x {EVENTS_PER_TILE} events, "
          f"{dt:.2f}s total, device={jax.devices()[0].platform}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
