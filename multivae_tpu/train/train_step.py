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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .losses import total_loss


class FlatAdamState(NamedTuple):
    count: jnp.ndarray
    mu: jnp.ndarray
    nu: jnp.ndarray


def flat_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam over the raveled parameter vector.

    Mathematically identical to ``optax.adam`` (eps_root=0), but the first/
    second-moment updates run as ONE fused kernel over a contiguous buffer
    instead of 3-4 kernels per parameter leaf. For this model family (~26
    small leaves) that removes ~80 kernel launches per step — the step is
    kernel-count-bound, not FLOP-bound.
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        # distinct buffers: sharing one zeros array between mu and nu would
        # donate the same buffer twice in the train step
        return FlatAdamState(count=jnp.zeros([], jnp.int32),
                             mu=jnp.zeros_like(flat),
                             nu=jnp.zeros_like(flat))

    def update(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * jnp.square(g)
        c = count.astype(mu.dtype)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        upd = -learning_rate * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(upd), FlatAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam with the reference hyperparameters (``experiment.py:267-271``)."""
    return flat_adam(cfg.initial_learning_rate, b1=cfg.beta_1, b2=cfg.beta_2)


def _member_step(cfg, model, optimizer):
    """The one canonical forward+grad+Adam step body, shared by the plain,
    scanned, ensemble and ensemble-scan builders below."""

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
        return (optax.apply_updates(params, updates), new_opt_state, loss,
                metrics)

    return one


def make_train_step(cfg, model, optimizer: Optional[optax.GradientTransformation] = None,
                    mesh: Optional[Mesh] = None, donate: bool = True):
    """Build the jitted ``(params, opt_state, batch, rng) -> ...`` step.

    When ``mesh`` is given, batch inputs are sharded over its ``data`` axis
    and params/opt_state are replicated; XLA inserts the gradient psum.
    ``donate`` reuses the params/opt buffers in place; verified stable on
    the axon-relayed TPU (300-step donated stress run clean) and
    overridable via ``cfg.donate_buffers`` from the trainer.
    """
    optimizer = optimizer or make_optimizer(cfg)
    step = _member_step(cfg, model, optimizer)
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


def _tp_jit(cfg, step, mesh, batch_spec, donate: bool,
            extra_in=(), extra_out=()):
    """Jit ``step`` with tensor-parallel shardings, resolved lazily from
    the first call's concrete params (the sharding tree needs leaf shapes).

    Params shard over the ``tensor`` axis per :func:`tp_param_spec`;
    ``opt_state`` stays replicated — the flat-Adam state is a raveled
    vector whose layout does not align with per-leaf hidden splits, and at
    this parameter count (~10-100k) the optimizer is not where the FLOPs
    are. Loss/metrics outputs are replicated.
    """
    from ..parallel import tp_shardings

    if cfg.hidden_dim % mesh.shape["tensor"] != 0:
        raise ValueError(
            f"tensor_parallel={mesh.shape['tensor']} must divide "
            f"hidden_dim={cfg.hidden_dim} (the hidden dimension is what "
            f"shards over the tensor axis)")
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, batch_spec)
    cache = {}

    def run(params, opt_state, batch, rng, *extra):
        key = tuple(sorted(batch))
        fn = cache.get(key)
        if fn is None:
            p_sh = tp_shardings(mesh, params, cfg.hidden_dim)
            fn = jax.jit(
                step,
                in_shardings=(p_sh, repl, {k: batch_sh for k in batch},
                              repl) + tuple(extra_in),
                out_shardings=(p_sh, repl, repl, repl) + tuple(extra_out),
                donate_argnums=(0, 1) if donate else ())
            cache[key] = fn
        return fn(params, opt_state, batch, rng, *extra)

    return run


def make_tp_train_step(cfg, model, mesh: Mesh, optimizer=None,
                       donate: bool = True, shard_batch: bool = True):
    """Tensor-parallel ``(params, opt_state, batch, rng)`` step.

    The hidden dimension of every layer shards over the mesh's ``tensor``
    axis (column-parallel producing kernels, row-parallel consuming
    kernels — :func:`multivae_tpu.parallel.tp_param_spec`), the batch over
    ``data`` when ``shard_batch``; XLA/GSPMD inserts the activation
    all-reduces over ICI. New capability — the reference is single-device
    (``workflow.py:123-124``); at this model scale TP is a scaling surface
    rather than a single-chip win (SURVEY §2.6).
    """
    optimizer = optimizer or make_optimizer(cfg)
    step = _member_step(cfg, model, optimizer)
    spec = P("data") if shard_batch else P()
    return _tp_jit(cfg, step, mesh, spec, donate)


def make_tp_scan_train_step(cfg, model, mesh: Mesh, optimizer=None,
                            donate: bool = True, shard_batch: bool = True):
    """Tensor-parallel multi-step trainer: ``lax.scan`` over a stacked
    batch axis (``[n_steps, B, ...]``), params sharded over ``tensor``
    throughout the scan — one device dispatch per epoch, same contract as
    :func:`make_scan_train_step`."""
    optimizer = optimizer or make_optimizer(cfg)
    step = _member_step(cfg, model, optimizer)

    def one(carry, inp):
        params, opt_state = carry
        batch, rng = inp
        params, opt_state, loss, metrics = step(params, opt_state, batch,
                                                rng)
        return (params, opt_state), (loss, metrics)

    def scan_steps(params, opt_state, batches, rngs):
        (params, opt_state), (losses, metrics) = jax.lax.scan(
            one, (params, opt_state), (batches, rngs))
        return params, opt_state, losses, metrics

    spec = P(None, "data") if shard_batch else P()
    return _tp_jit(cfg, scan_steps, mesh, spec, donate)


def mesh_for_rows(mesh: Optional[Mesh], rows: int) -> Optional[Mesh]:
    """The ONE remainder-group sharding policy, shared by the per-epoch
    driver's ``remainder_scan_factory`` and the chunked runner: a group
    keeps the data mesh only when its row count divides the ``data``
    axis (otherwise it runs replicated — remainder groups are rare and
    small, and padding them would change the update math)."""
    if mesh is None or rows % mesh.shape["data"] != 0:
        return None
    return mesh


def make_scan_train_step(cfg, model, optimizer=None,
                         mesh: Optional[Mesh] = None, donate: bool = True):
    """Multi-step trainer: ``lax.scan`` over a stacked batch axis.

    Input batches carry a leading steps axis (``[n_steps, B, ...]``); the
    whole sequence of forward+grad+Adam updates runs in ONE device dispatch.
    For small models (256-wide MLPs) per-call host->device dispatch dominates
    wall clock, so scanning an epoch's worth of subset-homogeneous batches is
    the main throughput lever on TPU. Returns per-step losses and metrics
    stacked along the steps axis (so per-step logging is preserved).
    """
    optimizer = optimizer or make_optimizer(cfg)
    step = _member_step(cfg, model, optimizer)

    def one(carry, inp):
        params, opt_state = carry
        batch, rng = inp
        params, opt_state, loss, metrics = step(params, opt_state, batch,
                                                rng)
        return (params, opt_state), (loss, metrics)

    def scan_steps(params, opt_state, batches, rngs):
        (params, opt_state), (losses, metrics) = jax.lax.scan(
            one, (params, opt_state), (batches, rngs))
        return params, opt_state, losses, metrics

    donate_argnums = (0, 1) if donate else ()
    if mesh is None:
        return jax.jit(scan_steps, donate_argnums=donate_argnums)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data"))
    return jax.jit(scan_steps,
                   in_shardings=(repl, repl, data, repl),
                   out_shardings=(repl, repl, repl, repl),
                   donate_argnums=donate_argnums)


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


def make_scan_eval_step(cfg, model):
    """Whole-test-pass evaluator: ``lax.scan`` over stacked eval batches.

    ``(params, batches, rngs) -> (losses, metrics)`` with a leading batches
    axis on inputs and outputs. One dispatch + one host fetch replaces a
    dispatch and a ~25 ms relay ``device_get`` per test batch per epoch —
    the dominant wall-clock of long trainings on small cohorts."""

    def one(params, inp):
        batch, rng = inp
        rng_model, rng_loss = jax.random.split(rng)
        variables = {"params": params}
        out = model.apply(variables, batch, rngs={"sample": rng_model})
        loss, metrics = total_loss(cfg, model, variables, batch, out,
                                   rng_loss, train=False)
        return params, (loss, metrics)

    def scan_eval(params, batches, rngs):
        _, (losses, metrics) = jax.lax.scan(one, params, (batches, rngs))
        return losses, metrics

    return jax.jit(scan_eval)


def make_ensemble_train_step(cfg, model, optimizer=None,
                             mesh: Optional[Mesh] = None):
    """vmapped train step over a leading ensemble axis.

    The reference trains ``num_models`` ensemble members *sequentially*
    (``run_epochs.py:228-241``); on TPU the members are independent and map
    onto a ``model`` mesh axis. Params/opt_state/batches carry a leading
    ``[n_models]`` axis; each member consumes its own fold's batch.
    """
    optimizer = optimizer or make_optimizer(cfg)
    vstep = jax.vmap(_member_step(cfg, model, optimizer))
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


def make_ensemble_scan_train_step(cfg, model, optimizer=None,
                                  mesh: Optional[Mesh] = None):
    """Epoch trainer for the whole ensemble: ``lax.scan`` over a steps axis
    of the vmapped member step.

    Inputs carry BOTH a leading ensemble axis and a steps axis:
    ``params/opt_state`` are ``[n_models, ...]`` stacks, ``batches`` are
    ``{mod: [n_models, n_steps, B, d]}`` (each member consumes its own
    fold's batches), ``rngs`` is ``[n_models, n_steps]`` of PRNG keys.
    Returns per-member per-step ``losses [n_models, n_steps]`` and a metric
    dict with the same leading axes — the full scalar families survive.

    Replaces the reference's sequential member loop
    (``run_epochs.py:228-241``) with one device dispatch per epoch; with a
    ``(model, data)`` mesh the members spread over the ``model`` axis and
    each member's batch rows over ``data``.
    """
    optimizer = optimizer or make_optimizer(cfg)
    vstep = jax.vmap(_member_step(cfg, model, optimizer))

    def scan_steps(params, opt_state, batches, rngs):
        def body(carry, inp):
            p, o = carry
            batch, rng = inp
            p, o, loss, metrics = vstep(p, o, batch, rng)
            return (p, o), (loss, metrics)

        # scan wants the steps axis leading
        batches_t = {k: jnp.swapaxes(v, 0, 1) for k, v in batches.items()}
        rngs_t = jnp.swapaxes(rngs, 0, 1)
        (params, opt_state), (losses, metrics) = jax.lax.scan(
            body, (params, opt_state), (batches_t, rngs_t))
        swap = lambda x: jnp.swapaxes(x, 0, 1)  # -> [n_models, n_steps]
        return (params, opt_state, swap(losses),
                jax.tree_util.tree_map(swap, metrics))

    donate = (0, 1)
    if mesh is None:
        return jax.jit(scan_steps, donate_argnums=donate)
    ens = NamedSharding(mesh, P("model"))
    ens_data = NamedSharding(mesh, P("model", None, "data"))
    jitted = jax.jit(scan_steps,
                     in_shardings=(ens, ens, ens_data, ens),
                     out_shardings=(ens, ens, ens, ens),
                     donate_argnums=donate)

    def call(params, opt_state, batches, rngs):
        # inputs may arrive committed with a stale sharding (e.g. restacked
        # from last epoch's sliced outputs); place them explicitly
        params = jax.device_put(params, ens)
        opt_state = jax.device_put(opt_state, ens)
        batches = {k: jax.device_put(v, ens_data)
                   for k, v in batches.items()}
        rngs = jax.device_put(rngs, ens)
        return jitted(params, opt_state, batches, rngs)

    return call


def stack_trees(trees):
    """Stack a list of identically-shaped pytrees along a new leading
    (ensemble) axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def unstack_tree(tree, n: int):
    """Inverse of :func:`stack_trees`: n per-member pytrees."""
    return [jax.tree_util.tree_map(lambda x: x[i], tree) for i in range(n)]


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
