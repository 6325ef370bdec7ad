"""ELBO losses for the four training methods.

Reference: ``experiments/run_epochs.py:27-135`` (``calc_log_probs``,
``calc_klds``, ``calc_klds_style``, ``basic_routine_epoch``) and
``experiments/utils/utils.py:88-112`` (``calc_elbo``).

Semantics preserved exactly:

* ``moe``/``jsd``/``joint_elbo``:
  ``total = Σ_m w_rec_m · (−log p(x_m|z)) + β · (β_style · Σ_m w_style_m ·
  KL_style_m + β_content · joint_divergence)`` with ``w_rec_m = 1`` and
  ``w_style_m = β_style`` (``experiment.py:281-292``; note the reference
  multiplies β_style twice — once in ``style_weights`` and once in the loss).
* ``poe`` (with ``poe_unimodal_elbos``): joint ELBO plus one unimodal ELBO per
  present modality. The reference re-runs the model on a single-modality
  batch (``run_epochs.py:115-125``); here that is a second ``model.apply``
  with a one-key batch dict — still one fused XLA graph.

All terms are normalized by the batch size, as in the reference
(``norm_value=len(batch)``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .. import ops


def calc_log_probs(model, batch, rec) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Per-modality negative log-likelihoods and their weighted sum
    (``run_epochs.py:27-38``). ``rec_weights`` are all 1.0
    (``experiment.py:set_rec_weights``)."""
    log_probs = {}
    weighted = 0.0
    for mod in model.modalities:
        if mod.name not in batch:
            continue
        loc, scale = rec[mod.name]
        b = batch[mod.name].shape[0]
        lp = -ops.calc_log_prob(mod.likelihood, batch[mod.name], loc, scale,
                                norm_value=b)
        log_probs[mod.name] = lp
        weighted = weighted + 1.0 * lp
    return log_probs, weighted


def calc_klds(results, model=None) -> Dict[str, jnp.ndarray]:
    """Subset-posterior KLs to the unit prior (``run_epochs.py:41-48``).

    Computed from the stacked ``[S, B, D]`` subset posteriors in one
    reduction rather than one kernel per subset. ``subset_stack`` rows are
    in the MODEL's powerset enumeration order; the ``subsets`` dict only
    carries that order inside an unbroken trace (a jit boundary
    canonicalizes pytree dict keys to sorted order), so the stack path
    needs ``model`` to recover the row->key pairing."""
    subsets = results["latents"]["subsets"]
    stack = results["latents"].get("subset_stack")
    if stack is not None and model is not None:
        keys = [k for k in model.subsets if k in subsets]
        mus, logvars = stack
        b = mus.shape[1]
        rows = jnp.sum(
            ops.kl_divergence_per_sample(mus, logvars), axis=1) / b  # [S]
        return {key: rows[i] for i, key in enumerate(keys)}
    klds = {}
    for key, (mu, logvar) in subsets.items():
        klds[key] = ops.kl_divergence(mu, logvar, norm_value=mu.shape[0])
    return klds


def calc_klds_style(results) -> Dict[str, jnp.ndarray]:
    """Style-posterior KLs (``run_epochs.py:51-59``)."""
    klds = {}
    for key, val in results["latents"]["modalities"].items():
        if key.endswith("_style") and val[0] is not None:
            mu, logvar = val
            klds[key] = ops.kl_divergence(mu, logvar, norm_value=mu.shape[0])
    return klds


def _weighted_style_kld(model, cfg, klds_style) -> jnp.ndarray:
    """``calc_style_kld`` (``run_epochs.py:62-70``): Σ style_weights[m]·KL."""
    total = 0.0
    for mod in model.modalities:
        key = mod.name + "_style"
        if key in klds_style:
            total = total + cfg.beta_style * klds_style[key]
    return total


def total_loss(cfg, model, variables, batch, results, rng, *,
               train: bool = False, noise_uni=None,
               dropout_rngs_uni=None):
    """Method-dispatched total loss (``basic_routine_epoch``,
    ``run_epochs.py:73-135``). Returns ``(loss, metrics)``.

    ``noise_uni`` optionally supplies explicit reparameterization draws for
    the poe unimodal re-runs (``{mod: [B, width]}``) so the whole loss stays
    RNG-free — required inside Pallas kernels. ``dropout_rngs_uni``
    (``{mod: key}``) supplies the re-runs' dropout streams in that mode
    when ``dropout_rate > 0`` (the reference's model re-run draws fresh
    masks)."""
    log_probs, weighted_log_prob = calc_log_probs(model, batch,
                                                  results["rec"])
    group_divergence = results["joint_divergence"]
    klds = calc_klds(results, model)
    klds_style = {}
    if cfg.factorized_representation:
        klds_style = calc_klds_style(results)

    metrics = {"joint_divergence": group_divergence}
    # latent mu/logvar means per modality (TBLogger.write_latent_distr,
    # utils/TBLogger.py:25-36)
    for key, val in results["latents"]["modalities"].items():
        if val[0] is not None:
            metrics[f"latent_mu/{key}"] = jnp.mean(val[0])
            metrics[f"latent_logvar/{key}"] = jnp.mean(val[1])
    for k, v in log_probs.items():
        metrics[f"log_prob/{k}"] = v
    for k, v in klds.items():
        metrics[f"kld/{k}"] = v
    for k, v in klds_style.items():
        metrics[f"kld_style/{k}"] = v

    if cfg.method in ("moe", "jsd", "joint_elbo"):
        kld_style = (_weighted_style_kld(model, cfg, klds_style)
                     if cfg.factorized_representation else 0.0)
        kld_weighted = cfg.beta_style * kld_style + \
            cfg.beta_content * group_divergence
        loss = 1.0 * weighted_log_prob + cfg.beta * kld_weighted
    else:  # poe
        elbos = {}
        for mod in model.modalities:
            if mod.name not in batch:
                continue
            kld_style_m = klds_style.get(mod.name + "_style", 0.0)
            if cfg.poe_unimodal_elbos:
                # unimodal re-run on the single-modality batch
                # (run_epochs.py:115-125)
                uni_batch = {mod.name: batch[mod.name]}
                if noise_uni is not None:
                    kwargs = {}
                    if (dropout_rngs_uni is not None
                            and mod.name in dropout_rngs_uni):
                        kwargs["rngs"] = {
                            "dropout": dropout_rngs_uni[mod.name]}
                    r_mod = model.apply(variables, uni_batch, train=train,
                                        noise=noise_uni[mod.name], **kwargs)
                else:
                    rng, sub = jax.random.split(rng)
                    r_mod = model.apply(
                        variables, uni_batch, train=train,
                        rngs={"sample": sub,
                              "dropout": jax.random.fold_in(sub, 1)})
                loc, scale = r_mod["rec"][mod.name]
                b = batch[mod.name].shape[0]
                rec_mod = -ops.calc_log_prob(
                    mod.likelihood, batch[mod.name], loc, scale, norm_value=b)
                # calc_elbo for a single modality (utils/utils.py:101-111):
                # style weight applied once in klds_style gathering and once
                # via beta_style in the div term
                div = cfg.beta_content * klds[mod.name] + \
                    cfg.beta_style * (cfg.beta_style * kld_style_m)
                elbos[mod.name] = 1.0 * rec_mod + cfg.beta * div
                metrics[f"log_prob_uni/{mod.name}"] = rec_mod
        # joint elbo (utils/utils.py:94-100 'joint' branch)
        w_style_kld = _weighted_style_kld(model, cfg, klds_style)
        div = cfg.beta_content * group_divergence + cfg.beta_style * w_style_kld
        elbos["joint"] = weighted_log_prob + cfg.beta * div
        loss = sum(elbos.values())

    metrics["loss"] = loss
    return loss, metrics
