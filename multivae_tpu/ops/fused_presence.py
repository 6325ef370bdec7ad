"""Presence-specialized fused epoch kernels: missing-modality batches stay
on the Pallas path.

The reference flagship trains with ``--allow_missing_blocks``
(``/root/reference/README.md:76-79``) and the HBN cohort misses the rois
block for ~20% of subjects (``multimodal_cohort/fetchers/multiblock_fetcher.py:
102-119``), so every epoch routes a meaningful slice of its batches through
single-modality presence patterns (``run_epochs.py:155-160`` trains on
whatever subset the sampler emits). Rounds 1-4 handled those groups on the
general XLA-scan path; this module gives each single-present pattern its own
split-param Pallas epoch kernel — same discipline as
:mod:`multivae_tpu.ops.fused_methods` (pre-split per-head tensors, only
whole-tensor ``dot_general`` contractions, in-kernel ``jax.value_and_grad``,
params + Adam moments resident in VMEM across the step grid).

Semantics for a batch where only modality ``i`` is present (2-modality
model; reference ``BaseMMVae.py:181-239`` presence dispatch, reproduced by
``models/mmvae.py:100-197``):

* available subsets = the singleton ``{i}`` only;
* ``joint_elbo`` — subset posterior is the bare expert through the masked
  PoE (no prior expert: the subset is not the full modality set), joint =
  1-component mixture = that posterior, group divergence = its KL;
* ``moe`` — subset = the raw expert (moe_fusion singleton), joint = it,
  group divergence = its KL;
* ``jsd`` — mixture = [expert, unit] with uniform weights; joint = 2-way
  stratified selection; group divergence = alpha-JSD against the 2-expert
  alpha-PoE dynamic prior;
* ``poe`` — subset fuses with the unit prior expert; joint = it (it IS the
  full set of present modalities); loss adds the unimodal ELBO of the one
  present modality, whose model re-run (``run_epochs.py:115-125``) yields
  the same posterior with fresh reparameterization draws (and fresh dropout
  masks when dropout is on).

Absent-modality parameters receive exactly zero gradients and still take
the Adam decay update, matching ``optax``/``flat_adam`` over the full tree
on the general path.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_methods import METHODS, _row_masks, _uniform_bounds
from .fused_step import (
    LOG2PI,
    POE_EPS,
    SPLIT_NAMES,
    FusedConsts,
    FusedDims,
    dims_from,
    flatten_params,
    join_params,
    split_params,
    unflatten_grads,
)


def presence_metric_names(model, method: str, mod_idx: int) -> Tuple[str, ...]:
    """Scalar families the general path emits for a single-present batch
    (``train/losses.py:total_loss`` restricted to present modalities)."""
    m = model.modalities[mod_idx].name
    names = [
        "loss", "joint_divergence",
        f"log_prob/{m}", f"kld/{m}", f"kld_style/{m}_style",
        f"latent_mu/{m}", f"latent_logvar/{m}",
        f"latent_mu/{m}_style", f"latent_logvar/{m}_style",
    ]
    if method == "poe":
        names.append(f"log_prob_uni/{m}")
    return tuple(names)


def presence_noise_width(cfg, mod_idx: int) -> int:
    """Noise columns per sample: the model's fused draw for this presence
    pattern (``mmvae.py:noise_width``) plus, for poe, the unimodal re-run's
    fresh draw."""
    w = cfg.class_dim + cfg.style_dim[mod_idx]
    if cfg.method == "poe":
        w *= 2
    return w


def supports_presence_fused(cfg, model, batch) -> bool:
    """Kernel eligibility: the flagship architecture, any of the four
    methods, with exactly ONE of the two modalities present."""
    from .fused_step import vmem_budget_ok

    names = [m.name for m in model.modalities]
    present = [n for n in names if n in batch]
    return (
        vmem_budget_ok(cfg, model)
        and cfg.method in METHODS
        and len(model.modalities) == 2
        and len(present) == 1
        and cfg.num_hidden_layer_encoder == 1
        and cfg.num_hidden_layer_decoder == 0
        and cfg.factorized_representation
        and all(m.style_dim > 0 for m in model.modalities)
        and cfg.likelihood == "normal"
        and not cfg.learn_output_sample_scale
        and (cfg.method != "poe" or cfg.poe_unimodal_elbos)
    )


def presence_loss_split(method: str, dims: FusedDims, consts: FusedConsts,
                        learn_scale: bool, matmul_bf16: bool, mod_idx: int,
                        sp: Dict[str, jnp.ndarray], x, noise,
                        dropout_masks=None):
    """Scalar loss + metric list (ordered per :func:`presence_metric_names`)
    for a batch where only modality ``mod_idx`` is present.

    ``noise``: ``[B, presence_noise_width]`` standard-normal draws (layout:
    ``cd|s_i``; poe appends a second ``cd|s_i`` block for the unimodal
    re-run). ``dropout_masks``: pre-scaled keep masks ``[B, hidden]`` —
    ``(dm,)`` normally, ``(dm, dm_uni)`` for poe (the re-run draws fresh
    masks). Pure deterministic map, differentiable w.r.t. ``sp``.
    """
    e = f"enc{mod_idx + 1}"
    d = f"dec{mod_idx + 1}"
    s_dim = dims.s1 if mod_idx == 0 else dims.s2
    cd = dims.cd
    b = float(dims.b)
    beta, beta_style, beta_content = consts

    def _cast(a, bb):
        if matmul_bf16:
            return a.astype(jnp.bfloat16), bb.astype(jnp.bfloat16)
        return a, bb

    def dot(a, bb):
        a, bb = _cast(a, bb)
        return jnp.dot(a, bb, preferred_element_type=jnp.float32)

    def encode(dm):
        h = jnp.maximum(dot(x, sp[f"{e}_Wh"]) + sp[f"{e}_bh"][None, :], 0.0)
        if dm is not None:
            h = h * dm
        return (dot(h, sp[f"{e}_Wcmu"]) + sp[f"{e}_bcmu"][None, :],
                dot(h, sp[f"{e}_Wclv"]) + sp[f"{e}_bclv"][None, :],
                dot(h, sp[f"{e}_Wsmu"]) + sp[f"{e}_bsmu"][None, :],
                dot(h, sp[f"{e}_Wslv"]) + sp[f"{e}_bslv"][None, :])

    def kl_sum(mu, lv):
        return -0.5 * jnp.sum(1.0 - jnp.exp(lv) - jnp.square(mu) + lv) / b

    def kl_sum_vs(mu, lv, pm, plv):
        return -0.5 * jnp.sum(
            1.0 - jnp.exp(lv - plv) - jnp.square(mu - pm) / jnp.exp(plv)
            + lv - plv) / b

    def decode_nll(zs, zc):
        olv = sp[f"{d}_olv"]
        if not learn_scale:
            olv = jax.lax.stop_gradient(olv)
        loc = dot(zs, sp[f"{d}_Wds"]) + dot(zc, sp[f"{d}_Wdc"]) \
            + sp[f"{d}_bd"][None, :]
        return jnp.sum(0.5 * LOG2PI + 0.5 * olv
                       + 0.5 * jnp.square(x - loc) * jnp.exp(-olv)) / b

    cmu, clv, smu, slv = encode(
        dropout_masks[0] if dropout_masks is not None else None)
    t = 1.0 / (jnp.exp(clv) + POE_EPS)
    tp = 1.0 / (1.0 + POE_EPS)

    # -------- subset posterior / joint / group divergence per method --------
    if method == "joint_elbo":
        # masked PoE of the bare expert (no prior row): mu unchanged,
        # logvar = -log t (the eps-regularized form, fusion.py:77-110)
        mu_s, lv_s = cmu, -jnp.log(t)
        joint_mu, joint_lv = mu_s, lv_s
        kld_m = kl_sum(mu_s, lv_s)
        group_div = kld_m
    elif method == "moe":
        joint_mu, joint_lv = cmu, clv
        kld_m = kl_sum(cmu, clv)
        group_div = kld_m
    elif method == "jsd":
        kld_m = kl_sum(cmu, clv)
        # mixture [expert, unit], uniform weights; 2-way stratified rows
        m_a, _ = _row_masks(dims.b, _uniform_bounds(dims.b, 2), dims.b)
        joint_mu = m_a * cmu  # unit rows: mu = 0
        joint_lv = m_a * clv  # unit rows: logvar = 0
        # alpha-PoE dynamic prior over [expert, unit], alphas = 1/2
        tu = 1.0 / (1.0 + POE_EPS)
        w = 0.5
        pv = 1.0 / (w * (t + tu))
        pm = pv * (w * cmu * t)
        plv = jnp.log(pv)
        j_e = kl_sum_vs(cmu, clv, pm, plv)
        j_u = kl_sum_vs(jnp.zeros_like(pm), jnp.zeros_like(plv), pm, plv)
        group_div = (j_e + j_u) / 2.0
    else:  # poe: the singleton subset fuses with the unit prior expert
        ts = t + tp
        mu_s, lv_s = cmu * t / ts, -jnp.log(ts)
        joint_mu, joint_lv = mu_s, lv_s
        kld_m = kl_sum(mu_s, lv_s)
        group_div = kld_m

    # -------------------- reparameterize + decode + ELBO --------------------
    ej = noise[:, :cd]
    es = noise[:, cd:cd + s_dim]
    zc = joint_mu + ej * jnp.exp(0.5 * joint_lv)
    zs = smu + es * jnp.exp(0.5 * slv)
    nll = decode_nll(zs, zc)
    kld_s = kl_sum(smu, slv)

    extra = []
    if method != "poe":
        loss = (nll + beta * (beta_style * beta_style * kld_s
                              + beta_content * group_div))
    else:
        # unimodal re-run: same posterior family with fresh draws; under
        # dropout the re-run re-encodes with its own mask
        off = cd + s_dim
        uj = noise[:, off:off + cd]
        us = noise[:, off + cd:off + cd + s_dim]
        mu_u, lv_u, smu_u, slv_u = mu_s, lv_s, smu, slv
        if dropout_masks is not None:
            cmuu, clvu, smu_u, slv_u = encode(dropout_masks[1])
            tu_ = 1.0 / (jnp.exp(clvu) + POE_EPS)
            ts_u = tu_ + tp
            mu_u, lv_u = cmuu * tu_ / ts_u, -jnp.log(ts_u)
        zcu = mu_u + uj * jnp.exp(0.5 * lv_u)
        zsu = smu_u + us * jnp.exp(0.5 * slv_u)
        nll_uni = decode_nll(zsu, zcu)
        elbo_uni = nll_uni + beta * (beta_content * kld_m
                                     + beta_style * beta_style * kld_s)
        elbo_joint = nll + beta * (beta_content * group_div
                                   + beta_style * beta_style * kld_s)
        loss = elbo_uni + elbo_joint
        extra = [nll_uni]

    metrics = [loss, group_div, nll, kld_m, kld_s,
               jnp.mean(cmu), jnp.mean(clv),
               jnp.mean(smu), jnp.mean(slv)] + extra
    return loss, metrics


def _presence_epoch_kernel(method, dims, consts, learn_scale, matmul_bf16,
                           mod_idx, adam, n_met, n_masks, *refs):
    n = len(SPLIT_NAMES)
    lr, b1, b2, adam_eps = adam
    x_ref, noise_ref = refs[:2]
    mask_refs = refs[2:2 + n_masks]
    count_ref = refs[2 + n_masks]
    base = 3 + n_masks
    p_in = refs[base:base + n]
    mu_in = refs[base + n:base + 2 * n]
    nu_in = refs[base + 2 * n:base + 3 * n]
    metrics_ref = refs[base + 3 * n]
    p_out = refs[base + 1 + 3 * n:base + 1 + 4 * n]
    mu_out = refs[base + 1 + 4 * n:base + 1 + 5 * n]
    nu_out = refs[base + 1 + 5 * n:base + 1 + 6 * n]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for i in range(n):
            p_out[i][:] = p_in[i][:]
            mu_out[i][:] = mu_in[i][:]
            nu_out[i][:] = nu_in[i][:]

    sp = {name: p_out[i][:] for i, name in enumerate(SPLIT_NAMES)}
    x, noise = x_ref[0], noise_ref[0]
    masks = tuple(m[0] for m in mask_refs) if n_masks else None

    def loss_fn(p):
        return presence_loss_split(method, dims, consts, learn_scale,
                                   matmul_bf16, mod_idx, p, x, noise,
                                   dropout_masks=masks)

    # in-kernel autodiff of aligned dot_generals; absent-modality params are
    # untouched by the loss and get exact zero cotangents
    (loss, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(sp)
    for j in range(n_met):
        metrics_ref[step, j] = metrics[j]

    t = (count_ref[0, 0] + step + 1).astype(jnp.float32)
    bc1 = 1.0 - jnp.exp(t * math.log(b1))
    bc2 = 1.0 - jnp.exp(t * math.log(b2))
    for i, name in enumerate(SPLIT_NAMES):
        gi = g[name]
        mu = b1 * mu_out[i][:] + (1.0 - b1) * gi
        nu = b2 * nu_out[i][:] + (1.0 - b2) * jnp.square(gi)
        mu_out[i][:] = mu
        nu_out[i][:] = nu
        p_out[i][:] = p_out[i][:] - lr * (mu / bc1) / (
            jnp.sqrt(nu / bc2) + adam_eps)


def build_presence_epoch(cfg, model, mod_idx: int, interpret: bool = False,
                         matmul_bf16=None):
    """Un-jitted epoch trainer body for a single-present group:

    ``(params, opt_state, batches, rngs) -> (params, opt_state, losses,
    metrics)`` with ``batches = {present_mod: [n_steps, B, d]}`` and
    ``opt_state`` the FlatAdamState — the exact contract of
    ``make_scan_train_step``, so the trainer's remainder-group factories
    (``trainer.run_epochs`` / ``chunked.ChunkRunner``) can swap it in."""
    from jax.flatten_util import ravel_pytree

    from ..train.train_step import FlatAdamState

    method = cfg.method
    consts = FusedConsts(cfg.beta, cfg.beta_style, cfg.beta_content)
    name = model.modalities[mod_idx].name
    learn_scale = bool(cfg.learn_output_scale)
    adam = (cfg.initial_learning_rate, cfg.beta_1, cfg.beta_2, 1e-8)
    if matmul_bf16 is None:
        matmul_bf16 = getattr(cfg, "precision", "float32") == "bfloat16"
    mnames = presence_metric_names(model, method, mod_idx)
    n_met = len(mnames)
    total_w = presence_noise_width(cfg, mod_idx)
    rate = float(cfg.dropout_rate)
    n_masks = 0
    if rate > 0.0:
        n_masks = 2 if method == "poe" else 1

    def scan_steps(params, opt_state, batches, rngs):
        xs = batches[name]
        n_steps, b = xs.shape[0], xs.shape[1]
        dims = dims_from(cfg, b)
        noise = jax.vmap(lambda k: jax.random.normal(
            k, (b, total_w), jnp.float32))(rngs)
        mask_grids = []
        if n_masks:
            def draw_masks(k):
                keep = jax.random.bernoulli(
                    jax.random.fold_in(k, 7), 1.0 - rate,
                    (n_masks, b, cfg.hidden_dim))
                return keep.astype(jnp.float32) / (1.0 - rate)

            all_masks = jax.vmap(draw_masks)(rngs)
            mask_grids = [all_masks[:, i] for i in range(n_masks)]
        _, unravel = ravel_pytree(params)
        sp = split_params(flatten_params(params, model), dims)
        mu = split_params(flatten_params(unravel(opt_state.mu), model), dims)
        nu = split_params(flatten_params(unravel(opt_state.nu), model), dims)
        count_arr = jnp.asarray(opt_state.count, jnp.int32).reshape(1, 1)

        n = len(SPLIT_NAMES)
        whole = pl.BlockSpec(memory_space=pltpu.VMEM)
        stream = lambda w: pl.BlockSpec((1, b, w), lambda i: (i, 0, 0))
        x_dim = cfg.input_dim[mod_idx]
        kernel = partial(_presence_epoch_kernel, method, dims, consts,
                         learn_scale, matmul_bf16, mod_idx, adam, n_met,
                         n_masks)
        out_shapes = (
            [jax.ShapeDtypeStruct((n_steps, n_met), jnp.float32)]
            + [jax.ShapeDtypeStruct(sp[nm].shape, jnp.float32)
               for nm in SPLIT_NAMES] * 3)
        out_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                     + [whole] * (3 * n))
        inputs = ([xs, noise] + mask_grids + [count_arr]
                  + [sp[nm] for nm in SPLIT_NAMES]
                  + [mu[nm] for nm in SPLIT_NAMES]
                  + [nu[nm] for nm in SPLIT_NAMES])
        in_specs = ([stream(x_dim), stream(total_w)]
                    + [stream(cfg.hidden_dim)] * n_masks
                    + [pl.BlockSpec(memory_space=pltpu.SMEM)]
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
        mgrid = outs[0]
        sp_new = {nm: outs[1 + i] for i, nm in enumerate(SPLIT_NAMES)}
        mu_new = {nm: outs[1 + n + i] for i, nm in enumerate(SPLIT_NAMES)}
        nu_new = {nm: outs[1 + 2 * n + i]
                  for i, nm in enumerate(SPLIT_NAMES)}
        new_params = unflatten_grads(join_params(sp_new, dims), params, model)
        mu_tree = unflatten_grads(join_params(mu_new, dims), params, model)
        nu_tree = unflatten_grads(join_params(nu_new, dims), params, model)
        new_state = FlatAdamState(
            count=opt_state.count + n_steps,
            mu=ravel_pytree(mu_tree)[0],
            nu=ravel_pytree(nu_tree)[0])
        metrics = {nm: mgrid[:, j] for j, nm in enumerate(mnames)}
        return new_params, new_state, mgrid[:, 0], metrics

    return scan_steps


def make_presence_fused_epoch(cfg, model, mod_idx: int,
                              interpret: bool = False, matmul_bf16=None):
    """Jitted presence-group epoch trainer (see :func:`build_presence_epoch`)."""
    return jax.jit(build_presence_epoch(cfg, model, mod_idx,
                                        interpret=interpret,
                                        matmul_bf16=matmul_bf16))
