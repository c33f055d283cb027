"""Worker for the two-process jax.distributed test.

Launched twice by tests/test_distributed_2proc.py with the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
and 4 virtual CPU devices per process.  Runs the full multi-process
sharded pipeline (ctrl + exclusions + exact BH + boundary peak merge)
via parallel.distributed.distributed_analyze and writes its result to
the JSON path given as argv[1].

Also runnable single-process (no env vars): the same fixture through
the same code path degenerates to jax.process_count() == 1, which the
driver uses as the expected output.
"""

from __future__ import annotations

import json
import sys

import numpy as np

N_TILES = 8
TILE_LEN = 4096
GENOME_LEN = N_TILES * TILE_LEN
MIN_PQ = 1.301029995663981  # -log10(0.05)
MIN_AUC = 20.0
MAX_GAP = 100
# excludes one block inside tile 0 and one straddling tiles 5/6
EXCL_BED = [1000, 1400, 6 * TILE_LEN - 200, 6 * TILE_LEN + 300]


def make_fixture():
    """Deterministic clustered events: expt cluster straddles the
    tile-3/4 boundary (the process boundary under 2x4 devices)."""
    rng = np.random.RandomState(7)
    n_bg = 2400
    start = rng.randint(0, GENOME_LEN - 300, n_bg)
    cluster = rng.randint(3 * TILE_LEN + 3500, 4 * TILE_LEN + 500,
                          4000)
    start = np.concatenate([start, cluster]).astype(np.int64)
    end = np.minimum(start + rng.randint(80, 300, len(start)),
                     GENOME_LEN).astype(np.int64)
    # multimapper weights 1/2 and 1/5 exercise the fraction classes
    count = rng.choice([1, 1, 1, 2, 5], len(start)).astype(np.int32)

    cstart = rng.randint(0, GENOME_LEN - 250, 1500).astype(np.int64)
    cend = np.minimum(cstart + rng.randint(100, 250, len(cstart)),
                      GENOME_LEN).astype(np.int64)
    ccount = np.ones(len(cstart), np.int32)
    return (start, end, count), (cstart, cend, ccount)


def run():
    from genrich_tpu.parallel import distributed as dist

    dist.init_distributed()
    expt, ctrl = make_fixture()
    peaks, lam, factor = dist.distributed_analyze(
        expt[0], expt[1], expt[2], N_TILES, TILE_LEN, GENOME_LEN,
        MIN_PQ, MIN_AUC, min_len=0, max_gap=MAX_GAP, qval_opt=True,
        ctrl=ctrl, excl_bed=EXCL_BED)
    return {
        "peaks": [[int(s), int(e), float(a), float(pv), float(qv),
                   int(pos)] for (s, e, a, pv, qv, pos) in peaks],
        "lam": lam,
        "factor": factor,
    }


if __name__ == "__main__":
    out = run()
    with open(sys.argv[1], "w") as fh:
        json.dump(out, fh)
    print("dist2_worker: ok", flush=True)
