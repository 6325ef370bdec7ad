"""Generic fused epoch kernel: any method, autodiff inside Pallas.

The hand-derived kernel in :mod:`multivae_tpu.ops.fused_step` covers the
flagship MoPoE configuration. This module generalizes the same
epoch-per-launch structure to ALL four training methods (moe/poe/jsd/
joint_elbo) and arbitrary supported architectures by tracing
``jax.value_and_grad`` of the real model loss (``model.apply`` +
``train.losses.total_loss``) INSIDE the Pallas kernel body — autodiff emits
ordinary jnp primitives, which Mosaic lowers like any other kernel code.
Params and Adam moments stay resident in VMEM across the grid; per-step
PRNG keys are streamed and threefry runs on-device.

Requirements: every param/activation fits VMEM (true for this model family),
and all modalities present in the batch (subset-homogeneous full batches; the
remainder takes the general XLA path, as in the trainer).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_generic_fused(cfg, model, batch) -> bool:
    """Generic-kernel eligibility: full modality presence; any method."""
    names = [m.name for m in model.modalities]
    if not all(n in batch for n in names):
        return False
    # dropout IS supported: flax's per-module threefry fold_in + bernoulli
    # lower fine inside Mosaic with raw uint32 keys (verified on TPU); the
    # per-step dropout key streams in alongside the reparam noise.
    # jsd is supported too: its alpha-PoE weights are static numpy constants
    # (ops/fusion.py:alpha_poe), so no rank-changing reshape reaches Mosaic
    from .fused_step import vmem_budget_ok

    return vmem_budget_ok(cfg, model)


def make_generic_fused_epoch(cfg, model, interpret: bool = False):
    """Epoch trainer via in-kernel autodiff.

    ``(params, opt_state, batches, rngs) -> (params, opt_state, losses,
    metrics)`` with ``batches = {mod: [n_steps, B, d]}``, ``rngs [n_steps]``
    PRNG keys, and ``metrics`` the full per-step scalar families
    (``{name: [n_steps]}``, same keys as ``total_loss``). ``opt_state`` is
    the FlatAdamState; converted at the boundary.
    """
    from jax.flatten_util import ravel_pytree

    from ..train.losses import total_loss

    names = [m.name for m in model.modalities]
    lr, b1, b2, adam_eps = (cfg.initial_learning_rate, cfg.beta_1,
                            cfg.beta_2, 1e-8)
    use_drop = float(cfg.dropout_rate) > 0.0

    def scan_steps(params, opt_state, batches, rngs):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        n = len(leaves)
        _, unravel = ravel_pytree(params)
        mu_leaves = jax.tree_util.tree_leaves(unravel(opt_state.mu))
        nu_leaves = jax.tree_util.tree_leaves(unravel(opt_state.nu))
        n_steps = batches[names[0]].shape[0]
        b = batches[names[0]].shape[1]

        # Mosaic cannot lower typed-key splitting, so ALL reparameterization
        # noise is drawn outside and streamed: the model's fused main draw
        # plus, for poe's unimodal re-runs, one draw per modality.
        main_w = model.noise_width({n: None for n in names})
        uni_ws = {m.name: model.noise_width({m.name: None})
                  for m in model.modalities} if cfg.method == "poe" else {}
        widths = [main_w] + [uni_ws[m.name] for m in model.modalities
                             if m.name in uni_ws]
        total_w = sum(widths)

        def draw(key):
            return jax.random.normal(key, (b, total_w), jnp.float32)

        noise_all = jax.vmap(draw)(rngs)  # [n_steps, B, total_w]

        def split_noise(eps):
            main = eps[:, :main_w]
            uni = {}
            off = main_w
            for m in model.modalities:
                if m.name in uni_ws:
                    uni[m.name] = eps[:, off:off + uni_ws[m.name]]
                    off += uni_ws[m.name]
            return main, (uni or None)

        metric_names_box = []

        def pure_step(p_leaves, batch_arrays, eps, dkey):
            batch = {name: batch_arrays[i] for i, name in enumerate(names)}
            noise_main, noise_uni = split_noise(eps)
            p = jax.tree_util.tree_unflatten(treedef, p_leaves)
            apply_kw = {}
            drop_uni = None
            if use_drop:
                apply_kw["rngs"] = {"dropout": dkey}
                if noise_uni is not None:
                    drop_uni = {name: jax.random.fold_in(dkey, 100 + i)
                                for i, name in enumerate(noise_uni)}

            def loss_fn(pp):
                out = model.apply({"params": pp}, batch, train=True,
                                  noise=noise_main, **apply_kw)
                return total_loss(cfg, model, {"params": pp}, batch, out,
                                  None, train=True, noise_uni=noise_uni,
                                  dropout_rngs_uni=drop_uni)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            # full scalar families ride along with the loss (the names are
            # recorded at trace time for the host-side unpacking)
            mnames = sorted(k for k in metrics if k != "loss")
            metric_names_box.clear()
            metric_names_box.extend(mnames)
            return ([loss]
                    + [jnp.asarray(metrics[k], jnp.float32)
                       for k in mnames]
                    + jax.tree_util.tree_leaves(grads))

        example_batch = [jax.ShapeDtypeStruct(batches[nm].shape[1:],
                                              batches[nm].dtype)
                         for nm in names]
        example_leaves = [jax.ShapeDtypeStruct(x.shape, x.dtype)
                          for x in leaves]
        example_kbits = jax.ShapeDtypeStruct((b, total_w), jnp.float32)
        example_dkey = jax.ShapeDtypeStruct((2,), jnp.uint32)
        closed = jax.make_jaxpr(pure_step)(example_leaves, example_batch,
                                           example_kbits, example_dkey)
        consts = [jnp.asarray(c) for c in closed.consts]
        n_consts = len(consts)
        mnames = list(metric_names_box)
        n_met = len(mnames)

        def converted(p_vals, batch_arrays, kbits, dkey, *const_vals):
            flat_args = list(p_vals) + list(batch_arrays) + [kbits, dkey]
            return jax.core.eval_jaxpr(closed.jaxpr, list(const_vals),
                                       *flat_args)

        def kernel(*refs):
            i0 = len(names)
            x_refs = refs[:i0]
            key_ref = refs[i0]
            dk_ref = refs[i0 + 1]
            cnt_ref = refs[i0 + 2]
            p_in = refs[i0 + 3:i0 + 3 + n]
            mu_in = refs[i0 + 3 + n:i0 + 3 + 2 * n]
            nu_in = refs[i0 + 3 + 2 * n:i0 + 3 + 3 * n]
            const_refs = refs[i0 + 3 + 3 * n:i0 + 3 + 3 * n + n_consts]
            o0 = i0 + 3 + 3 * n + n_consts   # outputs follow all inputs
            loss_ref = refs[o0]
            p_out = refs[o0 + 1:o0 + 1 + n]
            mu_out = refs[o0 + 1 + n:o0 + 1 + 2 * n]
            nu_out = refs[o0 + 1 + 2 * n:o0 + 1 + 3 * n]

            step = pl.program_id(0)

            @pl.when(step == 0)
            def _init():
                for k in range(n):
                    p_out[k][:] = p_in[k][:]
                    mu_out[k][:] = mu_in[k][:]
                    nu_out[k][:] = nu_in[k][:]

            batch_arrays = [x_refs[i][0] for i in range(len(names))]
            eps = key_ref[0]
            # per-step raw dropout key: scalars from SMEM
            dkey = jnp.stack([dk_ref[step, 0], dk_ref[step, 1]])
            p_vals = [p_out[k][:] for k in range(n)]
            const_vals = [c[:] for c in const_refs]
            outs_step = converted(p_vals, batch_arrays, eps, dkey,
                                  *const_vals)
            loss = outs_step[0]
            mvals = outs_step[1:1 + n_met]
            g_leaves = outs_step[1 + n_met:]
            loss_ref[step, 0] = loss
            for j in range(n_met):
                loss_ref[step, 1 + j] = mvals[j]
            t = (cnt_ref[0, 0] + step + 1).astype(jnp.float32)
            bc1 = 1.0 - jnp.exp(t * math.log(b1))
            bc2 = 1.0 - jnp.exp(t * math.log(b2))
            for k in range(n):
                gi = g_leaves[k]
                mu = b1 * mu_out[k][:] + (1.0 - b1) * gi
                nu = b2 * nu_out[k][:] + (1.0 - b2) * jnp.square(gi)
                mu_out[k][:] = mu
                nu_out[k][:] = nu
                p_out[k][:] = p_out[k][:] - lr * (mu / bc1) / (
                    jnp.sqrt(nu / bc2) + adam_eps)

        whole = pl.BlockSpec(memory_space=pltpu.VMEM)
        stream = lambda d: pl.BlockSpec((1, b, d), lambda i: (i, 0, 0))
        cnt = jnp.asarray(opt_state.count, jnp.int32).reshape(1, 1)
        # per-step dropout keys derived from the step keys (all-zero and
        # unused when dropout is off — the jaxpr then ignores the arg)
        dkeys = jax.vmap(lambda k: jax.random.fold_in(k, 7))(rngs) \
            if use_drop else jnp.zeros((n_steps, 2), jnp.uint32)
        dkeys = jnp.asarray(dkeys, jnp.uint32)
        inputs = ([batches[name] for name in names]
                  + [noise_all, dkeys, cnt] + leaves + mu_leaves + nu_leaves
                  + list(consts))
        in_specs = ([stream(batches[name].shape[-1]) for name in names]
                    + [stream(total_w),
                       pl.BlockSpec(memory_space=pltpu.SMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)]
                    + [whole] * (3 * n)
                    + [whole] * n_consts)
        out_shapes = ([jax.ShapeDtypeStruct((n_steps, 1 + n_met),
                                            jnp.float32)]
                      + [jax.ShapeDtypeStruct(x.shape, x.dtype)
                         for x in leaves] * 3)
        out_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                     + [whole] * (3 * n))
        outs = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(*inputs)
        losses = outs[0][:, 0]
        metrics = {"loss": losses}
        for j, mname in enumerate(mnames):
            metrics[mname] = outs[0][:, 1 + j]
        new_params = jax.tree_util.tree_unflatten(treedef, outs[1:1 + n])
        mu_tree = jax.tree_util.tree_unflatten(treedef,
                                               outs[1 + n:1 + 2 * n])
        nu_tree = jax.tree_util.tree_unflatten(treedef,
                                               outs[1 + 2 * n:1 + 3 * n])
        from ..train.train_step import FlatAdamState
        new_state = FlatAdamState(
            count=opt_state.count + n_steps,
            mu=ravel_pytree(mu_tree)[0],
            nu=ravel_pytree(nu_tree)[0])
        return new_params, new_state, losses, metrics

    return jax.jit(scan_steps)
