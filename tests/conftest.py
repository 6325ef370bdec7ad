"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware. The environment's sitecustomize
registers an axon TPU backend and exports ``JAX_PLATFORMS=axon`` before this
file runs, so we flip the jax config to CPU here (backends are registered but
not yet initialized at conftest-import time).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: CPU compiles here are ~1s per graph; caching
# across runs keeps the suite fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
from jax._src import xla_bridge  # noqa: E402

if not xla_bridge.backends_are_initialized():
    xla_bridge._clear_backends()
