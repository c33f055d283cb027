"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The environment's sitecustomize registers the axon TPU backend and
pins jax_platforms to "axon,cpu"; tests must run on CPU (fast local
compiles, 8 virtual devices), so re-pin to cpu here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:  # pragma: no cover
    pass
