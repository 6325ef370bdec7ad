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

def save_checkpoint(ckpt_dir: str, params, opt_state=None,
                    model_save: str = "model") -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, model_save)
    with open(path, "wb") as fh:
        fh.write(serialization.to_bytes(jax.device_get(params)))
    if opt_state is not None:
        with open(os.path.join(ckpt_dir, "opt_state"), "wb") as fh:
            fh.write(serialization.to_bytes(jax.device_get(opt_state)))
    return path


def save_networks(checkpoints_dir: str, params) -> None:
    """Per-modality encoder/decoder dumps (``BaseMMVae.save_networks``,
    ``BaseMMVae.py:315-322``): files ``enc_<mod>`` / ``dec_<mod>`` at the
    checkpoints root, overwritten at each save."""
    os.makedirs(checkpoints_dir, exist_ok=True)
    host = jax.device_get(params)
    for key, sub in host.items():
        if key.startswith("enc_") or key.startswith("dec_"):
            with open(os.path.join(checkpoints_dir, key), "wb") as fh:
                fh.write(serialization.to_bytes(sub))


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
