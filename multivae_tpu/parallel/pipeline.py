"""GPipe-style pipeline parallelism over homogeneous layer stacks.

The reference is strictly single-device (``workflow.py:123-124``) and SURVEY
§2.6 records pipeline parallelism as absent there. This module supplies the
TPU-native capability: stages of a deep layer stack are placed one-per-device
along a 1-D ``("pipe",)`` mesh and microbatches stream through the pipeline
with ``lax.ppermute`` hops over ICI. The schedule is the classic GPipe fill/
drain: with ``S`` stages and ``M`` microbatches the pipeline runs
``T = M + S - 1`` ticks and the bubble fraction is ``(S - 1) / T``. Each
device executes *only its own stage* per tick (true SPMD pipelining, not a
replicated broadcast), and the whole schedule is a single ``lax.scan`` under
``shard_map``, so ``jax.grad`` through it yields the reverse pipeline
automatically — backward hops ride the same ICI links in the opposite
direction.

Scope note (honesty): the flagship cohort models are 1-hidden-layer
256-wide MLPs (SURVEY §2.6 documents why TP/PP cannot win at that scale), so
pipelining is a *scaling surface* for deep stacks, demonstrated end-to-end by
``tests/test_pipeline.py`` and the ``dryrun_multichip`` pipeline segment, not
the single-chip default. Stages must be homogeneous (same activation shape
in and out); heterogeneous first layers are handled by zero-padding the
input to the stack width, which is numerically exact — padded kernel rows
only ever multiply zeros, so both the activations and every gradient are
bit-identical to the unpadded computation.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def pipe_mesh(n_stages: int, devices: Optional[Sequence] = None) -> Mesh:
    """1-D ``("pipe",)`` mesh with one pipeline stage per device."""
    devices = list(devices if devices is not None else jax.devices())
    if n_stages > len(devices):
        raise ValueError(
            f"pipeline of {n_stages} stages needs {n_stages} devices, "
            f"have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), ("pipe",))


def stack_stages(stage_params: Sequence):
    """Stack per-stage parameter pytrees along a new leading stage axis.

    All stages must share a tree structure and per-leaf shapes (homogeneous
    pipeline); the stacked leaves are what ``pipeline_apply`` shards over
    the ``pipe`` mesh axis.
    """
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *stage_params)


def pipeline_apply(stage_fn: Callable, stacked_params, x: jnp.ndarray, *,
                   n_micro: int, mesh: Mesh, axis_name: str = "pipe",
                   with_coords: bool = False):
    """Run ``x`` through the stage stack with a GPipe microbatch schedule.

    Args:
      stage_fn: ``(stage_params, h[mb, d]) -> h[mb, d]`` — one pipeline
        stage; must preserve the activation shape (homogeneous stack).
        With ``with_coords=True`` the signature is
        ``(stage_params, h, stage, micro)`` where ``stage`` / ``micro``
        are traced scalars naming the stage index and the microbatch
        index it is processing — fold them into an rng key for
        stochastic stages (dropout): the same ``(stage, micro)`` fold in
        a sequential reference reproduces the pipeline bit for bit.
      stacked_params: pytree whose leaves have leading axis ``S`` (one slice
        per stage, e.g. from :func:`stack_stages`); sharded ``P("pipe")``.
      x: ``[batch, d]`` input activations (replicated).
      n_micro: number of microbatches; must divide ``batch``.
      mesh: a :func:`pipe_mesh`-style mesh whose ``axis_name`` size equals
        the stage count.

    Returns:
      ``[batch, d]`` output activations (replicated), exactly equal to the
      sequential composition of the stages.

    Differentiable: ``jax.grad`` through this function produces the reverse
    (backward) pipeline over the same mesh.
    """
    n_stages = mesh.shape[axis_name]
    batch = x.shape[0]
    if batch % n_micro:
        raise ValueError(f"batch {batch} not divisible by n_micro {n_micro}")
    mb = batch // n_micro
    n_ticks = n_micro + n_stages - 1
    fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

    def spmd(params_local, x_full):
        # params_local leaves arrive with leading axis 1 (this stage's slice)
        p = jax.tree_util.tree_map(lambda a: a[0], params_local)
        stage = jax.lax.axis_index(axis_name)

        def tick(carry, t):
            buf, acc = carry
            # stage 0 injects microbatch t (clamped during the drain phase —
            # its recomputed output is never collected); later stages consume
            # the ppermuted output of their predecessor from the last tick
            start = jnp.clip(t, 0, n_micro - 1) * mb
            inj = jax.lax.dynamic_slice_in_dim(x_full, start, mb, axis=0)
            h = jnp.where(stage == 0, inj, buf)
            if with_coords:
                # stage s processes microbatch t - s at tick t (clamped to
                # a valid id during fill/drain — those outputs are never
                # committed, the clamp only keeps rng folds in range)
                micro = jnp.clip(t - stage, 0, n_micro - 1)
                out = stage_fn(p, h, stage, micro)
            else:
                out = stage_fn(p, h)
            # the last stage commits microbatch t - (S-1) once it exists
            opos = jnp.clip(t - (n_stages - 1), 0, n_micro - 1) * mb
            committed = jax.lax.dynamic_update_slice_in_dim(
                acc, out, opos, axis=0)
            take = jnp.logical_and(stage == n_stages - 1,
                                   t >= n_stages - 1)
            acc = jnp.where(take, committed, acc)
            nxt = (jax.lax.ppermute(out, axis_name, fwd_perm)
                   if fwd_perm else out)
            return (nxt, acc), None

        buf0 = jnp.zeros((mb,) + x_full.shape[1:], x_full.dtype)
        acc0 = jnp.zeros_like(x_full)
        (_, acc), _ = jax.lax.scan(tick, (buf0, acc0),
                                   jnp.arange(n_ticks))
        # broadcast the last stage's result to every device
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, acc, jnp.zeros_like(acc)),
            axis_name)

    fn = jax.shard_map(spmd, mesh=mesh,
                       in_specs=(P(axis_name), P()), out_specs=P(),
                       check_vma=False)
    return fn(stacked_params, x)


# ---------------------------------------------------------------------------
# worked end-to-end example: a pipelined deep-MLP regressor train step
# ---------------------------------------------------------------------------
def mlp_stage(p, h):
    """One homogeneous pipeline stage: ``relu(h @ w + b)``."""
    return jax.nn.relu(h @ p["w"] + p["b"])


def init_pipelined_mlp(key, in_dim: int, hidden: int, out_dim: int,
                       n_layers: int):
    """Deep-MLP params with the hidden stack stacked for pipelining.

    The first layer is folded into the homogeneous stack by zero-padding its
    kernel's input rows from ``in_dim`` to ``hidden`` (exact — see module
    docstring), so all ``n_layers`` stages are ``hidden -> hidden``.
    """
    ks = jax.random.split(key, n_layers + 1)
    stages = []
    for i in range(n_layers):
        fan_in = in_dim if i == 0 else hidden
        bound = 1.0 / np.sqrt(fan_in)
        w = jax.random.uniform(ks[i], (hidden, hidden), jnp.float32,
                               -bound, bound)
        if i == 0 and in_dim < hidden:
            w = w.at[in_dim:].set(0.0)
        b = jax.random.uniform(jax.random.fold_in(ks[i], 1), (hidden,),
                               jnp.float32, -bound, bound)
        stages.append({"w": w, "b": b})
    bound = 1.0 / np.sqrt(hidden)
    head = {"w": jax.random.uniform(ks[-1], (hidden, out_dim), jnp.float32,
                                    -bound, bound),
            "b": jnp.zeros((out_dim,), jnp.float32)}
    return {"stack": stack_stages(stages), "head": head}


def _pad_input(x, hidden):
    return jnp.pad(x, ((0, 0), (0, hidden - x.shape[1])))


def pipelined_mlp_loss(params, x, y, *, n_micro: int, mesh: Mesh):
    """MSE of the pipelined deep MLP (stack runs the GPipe schedule)."""
    h = pipeline_apply(mlp_stage, params["stack"],
                       _pad_input(x, params["head"]["w"].shape[0]),
                       n_micro=n_micro, mesh=mesh)
    pred = h @ params["head"]["w"] + params["head"]["b"]
    return jnp.mean((pred - y) ** 2)


def sequential_mlp_loss(params, x, y):
    """Single-device reference: the same stack applied by a plain scan."""
    h = _pad_input(x, params["head"]["w"].shape[0])
    h, _ = jax.lax.scan(lambda c, p: (mlp_stage(p, c), None),
                        h, params["stack"])
    pred = h @ params["head"]["w"] + params["head"]["b"]
    return jnp.mean((pred - y) ** 2)


def make_pipelined_train_step(mesh: Mesh, n_micro: int, lr: float = 1e-2):
    """SGD train step whose forward *and* backward run the pipeline."""

    @jax.jit
    def step(params, x, y):
        loss, grads = jax.value_and_grad(pipelined_mlp_loss)(
            params, x, y, n_micro=n_micro, mesh=mesh)
        new = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new, loss

    return step
