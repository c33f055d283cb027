"""Multi-host initialization and tile-partitioning helpers.

The single-controller program in mesh.py scales to multi-host by
initializing jax.distributed and building the mesh over all global
devices: the tile axis spans hosts, so intra-host tile traffic rides
ICI and only the three global collectives (fragment-length psum,
carry all_gather, q-histogram psum — see mesh.py) cross DCN.

Multi-host hardware is not available in this environment; this module
is exercised only in its single-process form (jax.distributed with
num_processes=1) plus the virtual-device mesh tests.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    No-op when unconfigured (single-process run).
    """
    import jax

    coordinator = coordinator or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes
                          or os.environ["JAX_NUM_PROCESSES"]),
        process_id=int(process_id or os.environ["JAX_PROCESS_ID"]))


def local_tile_range(n_tiles: int) -> range:
    """The contiguous block of global tiles this process owns.

    Hosts feed only their own tiles' events to the sharded program
    (jax.make_array_from_process_local_data handles placement).
    """
    import jax

    n_proc = jax.process_count()
    pid = jax.process_index()
    if n_tiles % n_proc:
        raise ValueError(
            f"n_tiles={n_tiles} must be a multiple of the process "
            f"count {n_proc}; pad the tile grid (empty tiles are "
            f"cheap) before sharding")
    per = n_tiles // n_proc
    return range(pid * per, (pid + 1) * per)


def host_local_events(start: np.ndarray, end: np.ndarray,
                      count: np.ndarray, n_tiles: int, tile_len: int,
                      pad_to: int):
    """Split this host's events into its local tiles (see
    mesh.split_events_to_tiles for the single-host variant)."""
    from .mesh import split_events_to_tiles

    return split_events_to_tiles(start, end, count, n_tiles, tile_len,
                                 pad_to)
