"""Device-mesh helpers for ensemble x data parallelism.

The reference is strictly single-device (``workflow.py:123-124``); this module
is the new TPU capability: a ``("model", "data")`` mesh where ensemble members
ride the model axis (they are embarrassingly parallel — the reference trains
them sequentially, ``run_epochs.py:228``) and the batch is sharded along the
data axis. XLA inserts the gradient reductions over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_model: int = 1, n_data: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(model, data)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_model * n_data
    if n > len(devices):
        raise ValueError(
            f"mesh {n_model}x{n_data} needs {n} devices, have "
            f"{len(devices)}")
    grid = np.array(devices[:n]).reshape(n_model, n_data)
    return Mesh(grid, ("model", "data"))


def data_mesh(n_data: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh."""
    devices = list(devices if devices is not None else jax.devices())
    n_data = n_data or len(devices)
    return Mesh(np.array(devices[:n_data]), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading ensemble axis over the model axis."""
    return NamedSharding(mesh, P("model"))


def ensemble_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[n_models, batch, ...] arrays: model x data sharding."""
    return NamedSharding(mesh, P("model", "data"))


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch dict with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


# ---------------------------------------------------------------------------
# tensor parallelism (hidden-dimension sharding)
# ---------------------------------------------------------------------------
def tp_mesh(n_tensor: int, n_data: int = 1,
            devices: Optional[Sequence] = None) -> Mesh:
    """``("data", "tensor")`` mesh for tensor(-and-data)-parallel training.

    The hidden dimension of every MLP layer shards over ``tensor`` (Megatron
    column/row split expressed as GSPMD ``PartitionSpec``s — XLA inserts the
    all-reduces over ICI); the batch shards over ``data``. The reference is
    single-device (``workflow.py:123-124``) and this model family is tiny
    (256-wide MLPs, SURVEY §2.6), so this is a capability/scaling surface,
    not a single-chip win.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_data * n_tensor
    if n > len(devices):
        raise ValueError(f"tp mesh {n_data}x{n_tensor} needs {n} devices, "
                         f"have {len(devices)}")
    grid = np.array(devices[:n]).reshape(n_data, n_tensor)
    return Mesh(grid, ("data", "tensor"))


def tp_param_spec(shape, hidden: int) -> P:
    """PartitionSpec for one parameter leaf under hidden-dim sharding.

    Dense kernels are ``(d_in, d_out)`` in flax: a kernel producing the
    hidden activation shards its output columns (``P(None, "tensor")``);
    a kernel consuming it shards its input rows (``P("tensor", None)`` —
    the row-parallel side whose matmul XLA completes with a psum); hidden-
    sized biases follow the column split. Everything else (heads narrower
    than ``hidden``, output scales, scalars) stays replicated.
    """
    shape = tuple(shape)
    if len(shape) == 2:
        if shape[0] == hidden:
            return P("tensor", None)
        if shape[1] == hidden:
            return P(None, "tensor")
    elif len(shape) == 1 and shape[0] == hidden:
        return P("tensor")
    return P()


def tp_shardings(mesh: Mesh, tree, hidden: int):
    """Map a params pytree to its tensor-parallel ``NamedSharding``s."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, tp_param_spec(np.shape(x), hidden)),
        tree)
