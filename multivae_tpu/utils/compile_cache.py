"""Persistent XLA compilation-cache setup shared by every entry surface.

The jitted programs (especially the Pallas epoch kernels and the DAA sweep)
cost ~30-370 s of remote compile through the relay per fresh process; with
the persistent cache, repeat invocations skip straight to execution. The
``JAX_COMPILATION_CACHE_DIR`` env-var spelling is silently ignored by this
jax build ("cache is disabled/not initialized") — ``jax.config.update`` is
required, which is why the CLI and the library workflows both route through
this helper instead of relying on the environment.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> None:
    """Point jax at the persistent compilation cache, unless the process
    already configured one (the test suite pins ``tests/.jax_cache``; a
    user's explicit ``jax.config`` choice is likewise respected)."""
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is not None:
            return
        cache_dir = os.environ.get(
            "MULTIVAE_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "multivae_tpu_jax"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # the cache is an optimization; never block an entry point
