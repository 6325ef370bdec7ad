"""Checkpoint save/load with the reference's directory layout.

Reference: every 5 epochs and at the end, the model state dict is written to
``checkpoints/[model_i/]<epoch:04d>/model`` (``run_epochs.py:243-256``) and
reloaded by latest-epoch discovery (``experiment.py:93-121``). Here the flax
param pytree is serialized with ``flax.serialization`` to the same path; the
optimizer state is additionally stored (``opt_state``) so resume is exact —
a capability the reference lacks.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

def _atomic_write(path: str, data: bytes) -> None:
    """Crash-safe file write: serialize to ``<path>.tmp``, fsync, then
    ``os.replace`` into place. A SIGKILL at any instant leaves either the
    previous complete file or none — never a torn one (the failure mode
    the crash-resume fault test injects)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


def save_checkpoint(ckpt_dir: str, params, opt_state=None,
                    model_save: str = "model") -> str:
    """Write one epoch checkpoint crash-safely.

    ``opt_state`` is written BEFORE the model file: ``find_checkpoint``
    only discovers epoch dirs through their ``model`` file, so ordering
    the pair this way makes the checkpoint atomic as a unit — a crash
    between the two writes leaves a dir that resume never selects, and
    once ``model`` appears its ``opt_state`` is already complete.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, model_save)
    if opt_state is not None:
        _atomic_write(os.path.join(ckpt_dir, "opt_state"),
                      serialization.to_bytes(jax.device_get(opt_state)))
    _atomic_write(path, serialization.to_bytes(jax.device_get(params)))
    return path


def save_networks(checkpoints_dir: str, params) -> None:
    """Per-modality encoder/decoder dumps (``BaseMMVae.save_networks``,
    ``BaseMMVae.py:315-322``): files ``enc_<mod>`` / ``dec_<mod>`` at the
    checkpoints root, overwritten at each save (atomically, so a crash
    mid-overwrite cannot tear the previous dump)."""
    os.makedirs(checkpoints_dir, exist_ok=True)
    host = jax.device_get(params)
    for key, sub in host.items():
        if key.startswith("enc_") or key.startswith("dec_"):
            _atomic_write(os.path.join(checkpoints_dir, key),
                          serialization.to_bytes(sub))


def restore_checkpoint(path: str, params_template):
    with open(path, "rb") as fh:
        return serialization.from_bytes(params_template, fh.read())


def restore_opt_state(ckpt_dir: str, opt_state_template):
    path = os.path.join(ckpt_dir, "opt_state")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        return serialization.from_bytes(opt_state_template, fh.read())


def find_checkpoint(checkpoints_dir: str, model_idx: int = 0,
                    num_models: int = 1, load_epoch: Optional[int] = None,
                    model_save: str = "model") -> Tuple[str, int]:
    """Latest (or requested-epoch) checkpoint path.

    Mirrors ``MultimodalExperiment.get_experiment`` discovery
    (``experiment.py:103-119``): glob ``*/model`` under the (per-member)
    checkpoint dir, sort by the integer epoch directory name, take the last —
    or, with ``load_epoch``, the newest checkpoint at or before it (the
    reference's boolean-argmin selection at ``:113-117`` degenerates to the
    first checkpoint; fixed here).
    """
    base = checkpoints_dir
    if num_models > 1:
        base = os.path.join(base, f"model_{model_idx}")
    cp_files = glob.glob(os.path.join(base, "*", model_save))
    if not cp_files:
        raise ValueError("You need first to train the model.")
    epochs = np.array([int(os.path.basename(os.path.dirname(p)))
                       for p in cp_files])
    order = np.argsort(epochs)
    cp_files = [cp_files[i] for i in order]
    epochs = epochs[order]
    if load_epoch is None:
        return cp_files[-1], int(epochs[-1])
    eligible = np.where(epochs <= load_epoch)[0]
    idx = int(eligible[-1]) if len(eligible) else 0
    return cp_files[idx], int(epochs[idx])
