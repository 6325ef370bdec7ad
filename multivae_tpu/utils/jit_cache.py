"""Model-keyed caches for jitted closures.

Eval helpers close a jitted program over a flax module; rebuilding the jit
per call forces a fresh trace + compile every time (seconds-to-minutes
through the remote-TPU relay). Caching by ``id(model)`` alone is unsafe —
ids recycle after garbage collection — so entries hold a strong reference
to the model and re-validate identity on lookup.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

_MAX_ENTRIES = 32  # a process works with a handful of models at most


def cached_jit(cache: Dict[tuple, tuple], model, extra: Tuple,
               build: Callable):
    """Return ``build()`` memoized under ``(id(model), *extra)``.

    ``build`` must return the jitted callable; it runs once per distinct
    (model, extra) pair. The cache is cleared wholesale when it outgrows
    ``_MAX_ENTRIES`` (bounded memory; recompiles are rare at that point).
    """
    key = (id(model), *extra)
    ent = cache.get(key)
    if ent is None or ent[0] is not model:
        if len(cache) > _MAX_ENTRIES:
            cache.clear()
        cache[key] = ent = (model, build())
    return ent[1]
