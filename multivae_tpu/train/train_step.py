"""Jitted train/eval steps with optional data-parallel sharding.

Replaces the reference's per-batch Python routine + Adam step
(``experiments/run_epochs.py:138-184``): forward, loss, backward and the
optimizer update compile into a single XLA graph. Distinct modality-presence
patterns (batch dict key-sets) each compile once — the reference's
subset-homogeneous batching (``MissingModalitySampler``) keeps that set tiny.

Data parallelism (new capability; the reference is single-device) shards the
batch across a ``data`` mesh axis with ``jax.sharding``; gradients are
reduced by XLA-inserted collectives over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .losses import total_loss


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam with the reference hyperparameters (``experiment.py:267-271``)."""
    return optax.adam(cfg.initial_learning_rate, b1=cfg.beta_1, b2=cfg.beta_2)


def make_train_step(cfg, model, optimizer: Optional[optax.GradientTransformation] = None,
                    mesh: Optional[Mesh] = None, donate: bool = True):
    """Build the jitted ``(params, opt_state, batch, rng) -> ...`` step.

    When ``mesh`` is given, batch inputs are sharded over its ``data`` axis
    and params/opt_state are replicated; XLA inserts the gradient psum.
    """
    optimizer = optimizer or make_optimizer(cfg)

    def step(params, opt_state, batch, rng):
        rng_model, rng_loss, rng_drop = jax.random.split(rng, 3)

        def loss_fn(p):
            variables = {"params": p}
            out = model.apply(variables, batch, train=True,
                              rngs={"sample": rng_model, "dropout": rng_drop})
            return total_loss(cfg, model, variables, batch, out, rng_loss,
                              train=True)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, metrics

    donate_argnums = (0, 1) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(repl, repl, data, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=donate_argnums,
    )


def make_eval_step(cfg, model, mesh: Optional[Mesh] = None):
    """Test-time routine: same loss without gradients/update
    (``run_epochs.py:187-219`` under ``torch.no_grad``)."""

    def step(params, batch, rng):
        rng_model, rng_loss = jax.random.split(rng)
        variables = {"params": params}
        out = model.apply(variables, batch,
                          rngs={"sample": rng_model})
        loss, metrics = total_loss(cfg, model, variables, batch, out,
                                   rng_loss, train=False)
        return loss, metrics

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl))


def make_ensemble_train_step(cfg, model, optimizer=None,
                             mesh: Optional[Mesh] = None):
    """vmapped train step over a leading ensemble axis.

    The reference trains ``num_models`` ensemble members *sequentially*
    (``run_epochs.py:228-241``); on TPU the members are independent and map
    onto a ``model`` mesh axis. Params/opt_state/batches carry a leading
    ``[n_models]`` axis; each member consumes its own fold's batch.
    """
    optimizer = optimizer or make_optimizer(cfg)

    def one(params, opt_state, batch, rng):
        rng_model, rng_loss, rng_drop = jax.random.split(rng, 3)

        def loss_fn(p):
            variables = {"params": p}
            out = model.apply(variables, batch, train=True,
                              rngs={"sample": rng_model, "dropout": rng_drop})
            return total_loss(cfg, model, variables, batch, out, rng_loss,
                              train=True)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt_state, loss, metrics

    vstep = jax.vmap(one)
    if mesh is None:
        return jax.jit(vstep, donate_argnums=(0, 1))
    ens = NamedSharding(mesh, P("model"))
    ens_data = NamedSharding(mesh, P("model", "data"))
    return jax.jit(
        vstep,
        in_shardings=(ens, ens, ens_data, ens),
        out_shardings=(ens, ens, ens, ens),
        donate_argnums=(0, 1),
    )


def init_params(cfg, model, example_batch, seed: int = 0):
    """Initialize model parameters from an example batch."""
    variables = model.init(
        {"params": jax.random.PRNGKey(seed),
         "sample": jax.random.PRNGKey(seed + 1)},
        example_batch)
    return variables["params"]


def init_train_state(cfg, model, example_batch, seed: int = 0,
                     optimizer=None):
    """(params, opt_state) for a fresh run."""
    optimizer = optimizer or make_optimizer(cfg)
    params = init_params(cfg, model, example_batch, seed)
    return params, optimizer.init(params)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
