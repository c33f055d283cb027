"""Persistent XLA compilation cache.

Remote/tunneled TPU compiles cost ~15 s per program shape; caching
compiled executables on disk makes warm CLI runs and benches start in
well under a second.  Opt out with GENRICH_TPU_XLA_CACHE="" or point
it at a different directory.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> None:
    cache = os.environ.get("GENRICH_TPU_XLA_CACHE")
    if cache == "":
        return
    if cache is None:
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "genrich_tpu", "xla")
    try:
        os.makedirs(cache, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0)
    except Exception:
        pass  # the cache is an optimization only
