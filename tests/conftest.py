"""Test environment: force CPU with an 8-device virtual mesh (SURVEY.md §7.4).

The container's sitecustomize force-registers a TPU backend (and sets
JAX_PLATFORMS=axon) at interpreter start, before pytest loads this file; a
single real chip cannot serve concurrent test processes and its matmuls run
in bf16, breaking full-precision oracles. Overriding the env var alone is not
enough once jax is imported, so we also flip jax's config if it's loaded.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
