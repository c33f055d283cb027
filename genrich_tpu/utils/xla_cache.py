"""Persistent XLA compilation cache.

Remote/tunneled TPU compiles cost ~15 s per program shape; caching
compiled executables on disk makes warm CLI runs and benches start in
well under a second.  Opt out with GENRICH_TPU_XLA_CACHE="" or point
it at a different directory.
"""

from __future__ import annotations

import hashlib
import os


def _host_tag() -> str:
    """Partition key: backend selection + host CPU feature set.

    XLA:CPU AOT executables encode the *compiling* machine's vector
    ISA; with a remote-compile relay in play (PALLAS_AXON_*), cache
    entries produced on an AVX512 build host would otherwise be loaded
    by this non-AVX512 host — worst case SIGILL mid-run.  Keying the
    directory by platform + a cpuinfo-flags digest keeps every
    (backend, host ISA) in its own namespace; TPU executables keep
    cross-run reuse within their own.
    """
    plat = os.environ.get("JAX_PLATFORMS", "default") or "default"
    # a TPU-pool relay (PALLAS_AXON_*) compiles on ITS machine, so
    # relay-produced executables must never share a namespace with
    # locally-compiled ones even for the same nominal platform
    relay = "relay" if os.environ.get("PALLAS_AXON_POOL_IPS") \
        else "local"
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line
                    break
    except OSError:
        pass
    digest = hashlib.sha256(flags.encode()).hexdigest()[:8]
    return f"{plat.replace(',', '_')}-{relay}-{digest}"


def enable_compile_cache() -> None:
    cache = os.environ.get("GENRICH_TPU_XLA_CACHE")
    if cache == "":
        return
    if cache is None:
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "genrich_tpu", "xla", _host_tag())
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
