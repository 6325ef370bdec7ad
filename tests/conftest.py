"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware. The environment's sitecustomize
registers an axon TPU backend and exports ``JAX_PLATFORMS=axon`` before this
file runs, so we flip the jax config to CPU here (backends are registered but
not yet initialized at conftest-import time).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# silence XLA:CPU AOT cache-load feature-mismatch E-spam (pseudo-features
# like +prefer-no-scatter differ between compile and host feature lists on
# the SAME machine; execution is fine, the log is per-cache-hit noise)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: CPU compiles here are 1-10s per graph and
# dominate suite wall clock. NOTE: the env-var spelling of these options is
# not honored in this jax build (the cache stays "disabled/not initialized");
# config.update is.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
from jax._src import xla_bridge  # noqa: E402

if not xla_bridge.backends_are_initialized():
    xla_bridge._clear_backends()
