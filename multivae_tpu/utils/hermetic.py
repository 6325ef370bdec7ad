"""Hermetic-CPU child environments (no TPU backend, ever).

The axon ``sitecustomize`` — triggered by the ``PALLAS_AXON_*`` env vars —
registers the TPU plugin and force-updates ``jax_platforms`` to
``"axon,cpu"`` at interpreter start, so ``JAX_PLATFORMS=cpu`` alone cannot
keep a child process off the TPU relay. Dropping the trigger vars keeps the
child 100% TPU-free; this is the ONE copy of that var list, shared by
``__graft_entry__.dryrun_multichip`` and ``bench.py``'s degraded-mode CPU
fallback (a missed copy would silently re-register the plugin and hang
against a dead relay).

This module must stay import-light: ``__graft_entry__`` imports it from a
parent process that must never import jax.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

AXON_TRIGGER_VARS = (
    "PALLAS_AXON_POOL_IPS",
    "PALLAS_AXON_REMOTE_COMPILE",
    "AXON_LOOPBACK_RELAY",
)


def hermetic_cpu_env(base: Optional[Dict[str, str]] = None,
                     n_devices: Optional[int] = None) -> Dict[str, str]:
    """A child-process env that can only ever initialize the CPU backend.

    Pops the axon sitecustomize trigger vars and pins ``JAX_PLATFORMS=cpu``
    (+ ``JAX_NUM_CPU_DEVICES`` when ``n_devices`` is given). Also silences
    the XLA:CPU AOT cache loader's per-hit feature-mismatch E-spam.
    """
    env = dict(os.environ if base is None else base)
    for var in AXON_TRIGGER_VARS:
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    if n_devices is not None:
        env["JAX_NUM_CPU_DEVICES"] = str(n_devices)
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    return env
