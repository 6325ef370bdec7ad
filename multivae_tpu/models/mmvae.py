"""The multimodal VAE (MVAE/PoE, MMVAE/MoE, MoPoE, JSD) as one flax module.

Reference behavior: ``experiments/utils/BaseMMVae.py`` (fusion dispatch
``:43-61``, joint divergence ``:64-93``, fusions ``:96-122``, conditions
``:125-134``, forward ``:137-165``, inference ``:181-239``, generation
``:242-312``). The TPU-first redesign:

* Modalities present in a batch are the batch dict's keys — a *static*
  property under jit, so all subset control flow resolves at trace time and
  each distinct presence pattern compiles once into a single fused graph
  (batches are subset-homogeneous, matching the reference sampler).
* All per-subset Gaussian products are computed by one masked-precision
  einsum over stacked ``[M, B, D]`` posteriors
  (:func:`multivae_tpu.ops.fusion.masked_poe_all_subsets`) instead of the
  reference's Python loop of ``torch.cat`` calls.
* Sampling is explicit-key (flax rng streams ``sample`` and ``dropout``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import ops
from .modalities import ModalitySpec, powerset_subsets
from .networks import Decoder, Encoder


class MultimodalVAE(nn.Module):
    """Presence-masked multimodal VAE over an ordered set of modalities."""

    modalities: Tuple[ModalitySpec, ...]
    method: str = "joint_elbo"      # poe | moe | jsd | joint_elbo
    class_dim: int = 20
    hidden_dim: int = 256
    num_hidden_layer_encoder: int = 1
    num_hidden_layer_decoder: int = 0
    dropout_rate: float = 0.0
    factorized_representation: bool = True
    initial_out_logvar: float = -3.0
    learn_output_scale: bool = True
    learn_output_sample_scale: bool = False

    @property
    def mod_names(self) -> Tuple[str, ...]:
        return tuple(m.name for m in self.modalities)

    @property
    def subsets(self) -> Dict[str, Tuple[str, ...]]:
        return powerset_subsets(self.mod_names)

    def setup(self):
        encs, decs = {}, {}
        for mod in self.modalities:
            encs[mod.name] = Encoder(
                input_dim=mod.dim, class_dim=self.class_dim,
                style_dim=mod.style_dim, hidden_dim=self.hidden_dim,
                num_hidden_layers=self.num_hidden_layer_encoder,
                dropout_rate=self.dropout_rate,
                factorized=self.factorized_representation,
                name=f"enc_{mod.name}")
            decs[mod.name] = Decoder(
                output_dim=mod.dim, class_dim=self.class_dim,
                style_dim=mod.style_dim, hidden_dim=self.hidden_dim,
                num_hidden_layers=self.num_hidden_layer_decoder,
                dropout_rate=self.dropout_rate,
                factorized=self.factorized_representation,
                initial_out_logvar=self.initial_out_logvar,
                learn_output_scale=self.learn_output_scale,
                learn_output_sample_scale=self.learn_output_sample_scale,
                name=f"dec_{mod.name}")
        self.encoders = encs
        self.decoders = decs

    # ------------------------------------------------------------------ rng
    def _reparameterize(self, mu, logvar):
        return ops.reparameterize(self.make_rng("sample"), mu, logvar)

    # ---------------------------------------------------------------- encode
    def encode(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        """Per-modality posteriors; absent modalities map to (None, None)
        (``BaseMMVae.encode``, ``:167-178``)."""
        latents = {}
        for mod in self.modalities:
            if mod.name in batch:
                s_mu, s_lv, c_mu, c_lv = self.encoders[mod.name](
                    batch[mod.name], train=train)
                latents[mod.name + "_style"] = (s_mu, s_lv)
                latents[mod.name] = (c_mu, c_lv)
            else:
                latents[mod.name + "_style"] = (None, None)
                latents[mod.name] = (None, None)
        return latents

    # ----------------------------------------------------------- subset fuse
    def _fuse_available_subsets(self, enc_mods, present: Tuple[str, ...]):
        """Posterior for every fully-available subset.

        Returns ``(subset_keys, sub_mus[S,B,D], sub_logvars[S,B,D])`` in the
        reference's powerset order (``BaseMMVae.py:190-216``).
        """
        present_set = set(present)
        avail = [(key, mods) for key, mods in self.subsets.items()
                 if all(m in present_set for m in mods)]
        keys = [k for k, _ in avail]
        # stack the present experts once: [Ma, B, D]
        mus = jnp.stack([enc_mods[m][0] for m in present])
        logvars = jnp.stack([enc_mods[m][1] for m in present])
        col = {m: i for i, m in enumerate(present)}
        num_total = len(self.modalities)

        if self.method in ("poe", "joint_elbo"):
            mask = np.zeros((len(avail), len(present)), np.float32)
            prior = np.zeros(len(avail), np.float32)
            for s, (_, mods) in enumerate(avail):
                for m in mods:
                    mask[s, col[m]] = 1.0
                # poe_fusion appends the unit prior expert when the method is
                # poe or the subset is the full modality set
                # (BaseMMVae.py:109-118).
                if self.method == "poe" or len(mods) == num_total:
                    prior[s] = 1.0
            sub_mus, sub_logvars = ops.masked_poe_all_subsets(
                mus, logvars, mask, prior)
        else:  # moe / jsd use moe_fusion for subset posteriors (:96-106)
            rows_mu, rows_lv = [], []
            for _, mods in avail:
                if len(mods) == 1:
                    rows_mu.append(mus[col[mods[0]]])
                    rows_lv.append(logvars[col[mods[0]]])
                else:
                    sel_mu = jnp.stack([mus[col[m]] for m in mods])
                    sel_lv = jnp.stack([logvars[col[m]] for m in mods])
                    mu_s, lv_s = ops.mixture_component_selection(sel_mu, sel_lv)
                    rows_mu.append(mu_s)
                    rows_lv.append(lv_s)
            sub_mus = jnp.stack(rows_mu)
            sub_logvars = jnp.stack(rows_lv)
        return keys, sub_mus, sub_logvars

    def _fusion_condition(self, mods: Tuple[str, ...],
                          present: Tuple[str, ...]) -> bool:
        """Which subsets join the joint mixture (``BaseMMVae.py:125-134``)."""
        if self.method in ("moe", "jsd"):
            return len(mods) == 1
        if self.method == "poe":
            return len(mods) == len(present)
        return True  # joint_elbo

    # -------------------------------------------------------------- inference
    def inference(self, batch: Dict[str, jnp.ndarray], *,
                  sample: bool = True, use_expert: Optional[str] = None,
                  train: bool = False):
        """Reference ``BaseMMVae.inference`` (``:181-239``)."""
        present = tuple(m.name for m in self.modalities if m.name in batch)
        if not present:
            raise ValueError("empty batch: no known modality present")
        enc_mods = self.encode(batch, train=train)
        keys, sub_mus, sub_logvars = self._fuse_available_subsets(
            enc_mods, present)
        distr_subsets = {k: (sub_mus[i], sub_logvars[i])
                         for i, k in enumerate(keys)}
        subset_stack = (sub_mus, sub_logvars)
        sel = [i for i, k in enumerate(keys)
               if self._fusion_condition(self.subsets[k], present)]
        # static integer stacking (no gather; Mosaic-compatible)
        mus = jnp.stack([sub_mus[i] for i in sel])
        logvars = jnp.stack([sub_logvars[i] for i in sel])
        if self.method == "jsd":
            # append the unit expert to the mixture (BaseMMVae.py:217-223)
            zero = jnp.zeros_like(mus[:1])
            mus = jnp.concatenate([mus, zero])
            logvars = jnp.concatenate([logvars, zero])
        k = mus.shape[0]
        # static host-side constant (k is trace-static); keeping it numpy
        # lets the jsd alpha-PoE reshape happen at trace time, which Mosaic
        # requires inside the fused kernels
        weights = np.full((k,), 1.0 / k, dtype=np.float32)
        if use_expert is not None:
            joint = distr_subsets[use_expert]
        elif sample:
            joint = ops.mixture_component_selection(mus, logvars)
        else:
            joint = (jnp.mean(mus, axis=0), jnp.mean(logvars, axis=0))
        return {
            "modalities": enc_mods,
            "mus": mus,
            "logvars": logvars,
            "weights": weights,
            "joint": joint,
            "subsets": distr_subsets,
            "subset_stack": subset_stack,
        }

    # ------------------------------------------------------------- divergence
    def _calc_joint_divergence(self, mus, logvars, weights):
        """Static- or dynamic-prior group divergence (``BaseMMVae.py:64-93``).

        Normalization is the batch size, as in the reference
        (``normalization=mus.shape[1]``)."""
        weights = ops.reweight_weights(weights)
        norm = mus.shape[1]
        if self.method == "jsd":
            group_div, klds, dyn_prior = ops.alpha_jsd_divergence(
                mus, logvars, weights, normalization=norm)
            return {"joint_divergence": group_div, "individual_divs": klds,
                    "dyn_prior": dyn_prior}
        group_div, klds = ops.group_divergence_moe(
            mus, logvars, weights, normalization=norm)
        return {"joint_divergence": group_div, "individual_divs": klds,
                "dyn_prior": None}

    # ---------------------------------------------------------------- forward
    def noise_width(self, present) -> int:
        """Width of the fused normal draw for a presence pattern."""
        total = self.class_dim
        for mod in self.modalities:
            if (mod.name in present and self.factorized_representation
                    and mod.style_dim > 0):
                total += mod.style_dim
        return total

    def __call__(self, batch: Dict[str, jnp.ndarray], *,
                 sample_latents: bool = True,
                 use_expert: Optional[str] = None, train: bool = False,
                 noise: Optional[jnp.ndarray] = None):
        """Full forward pass (``BaseMMVae.forward``, ``:137-165``).

        ``noise`` optionally supplies the fused reparameterization draw
        (``[B, noise_width(batch)]``) explicitly — used by kernels that
        cannot host an RNG stream; otherwise drawn from the ``sample`` rng.
        """
        latents = self.inference(batch, sample=sample_latents,
                                 use_expert=use_expert, train=train)
        joint_mu, joint_logvar = latents["joint"]

        # one fused normal draw covers the joint latent and every style
        # latent (a single RNG kernel instead of one per latent space)
        eps = None
        if sample_latents:
            b = joint_mu.shape[0]
            total = self.noise_width(batch)
            if noise is not None:
                eps = noise
            else:
                eps = jax.random.normal(self.make_rng("sample"), (b, total),
                                        joint_mu.dtype)
            class_z = joint_mu + eps[:, :self.class_dim] * jnp.exp(
                0.5 * joint_logvar)
        else:
            class_z = joint_mu
        divs = self._calc_joint_divergence(
            latents["mus"], latents["logvars"], latents["weights"])

        rec = {}
        offset = self.class_dim
        for m, mod in enumerate(self.modalities):
            if mod.name not in batch:
                continue
            s_mu, s_lv = latents["modalities"][mod.name + "_style"]
            if (self.factorized_representation and sample_latents
                    and mod.style_dim > 0):
                style_z = s_mu + eps[:, offset:offset + mod.style_dim] * \
                    jnp.exp(0.5 * s_lv)
                offset += mod.style_dim
            else:
                style_z = s_mu
            loc, scale = self.decoders[mod.name](style_z, class_z, train=train)
            rec[mod.name] = (loc, scale)

        out = {"latents": latents, "group_distr": latents["joint"],
               "rec": rec}
        out.update(divs)
        return out

    # -------------------------------------------------------------- generation
    def get_random_styles(self, num_samples: int):
        """Unit-normal style draws per modality (``BaseMMVae.py:302-312``)."""
        styles = {}
        for mod in self.modalities:
            if self.factorized_representation and mod.style_dim > 0:
                styles[mod.name] = jax.random.normal(
                    self.make_rng("sample"), (num_samples, mod.style_dim))
            else:
                styles[mod.name] = None
        return styles

    def get_random_style_dists(self, num_samples: int):
        """Unit-Gaussian default style distributions
        (``BaseMMVae.py:290-299``)."""
        styles = {}
        for mod in self.modalities:
            styles[mod.name] = (jnp.zeros((num_samples, mod.style_dim)),
                                jnp.zeros((num_samples, mod.style_dim)))
        return styles

    def generate_sufficient_statistics_from_latents(self, latents):
        """Decode (style, content) latents to output sufficient statistics
        (``BaseMMVae.py:257-264``)."""
        content = latents["content"]
        suff_stats = {}
        for mod in self.modalities:
            style = latents["style"][mod.name]
            loc, scale = self.decoders[mod.name](style, content)
            suff_stats[mod.name] = (loc, scale)
        return suff_stats

    def generate_from_latents(self, latents):
        """Distribution means per modality (``BaseMMVae.py:267-273``)."""
        suff = self.generate_sufficient_statistics_from_latents(latents)
        return {m: loc for m, (loc, scale) in suff.items()}

    def generate(self, num_samples: int):
        """Unconditional generation from the unit prior
        (``BaseMMVae.py:242-254``)."""
        mu = jnp.zeros((num_samples, self.class_dim))
        logvar = jnp.zeros((num_samples, self.class_dim))
        z_class = self._reparameterize(mu, logvar)
        z_styles = self.get_random_styles(num_samples)
        return self.generate_from_latents(
            {"content": z_class, "style": z_styles})

    def cond_generation(self, latent_distributions, num_samples=None):
        """Conditional generation from subset posteriors
        (``BaseMMVae.py:276-287``)."""
        if num_samples is None:
            num_samples = next(iter(latent_distributions.values()))[0].shape[0]
        style_latents = self.get_random_styles(num_samples)
        cond_gen = {}
        for key, (mu, logvar) in latent_distributions.items():
            content = self._reparameterize(mu, logvar)
            cond_gen[key] = self.generate_from_latents(
                {"content": content, "style": style_latents})
        return cond_gen


def build_model(cfg, modalities: Dict[str, ModalitySpec]) -> MultimodalVAE:
    """Construct the model from a :class:`multivae_tpu.train.config.Config`."""
    return MultimodalVAE(
        modalities=tuple(modalities.values()),
        method=cfg.method,
        class_dim=cfg.class_dim,
        hidden_dim=cfg.hidden_dim,
        num_hidden_layer_encoder=cfg.num_hidden_layer_encoder,
        num_hidden_layer_decoder=cfg.num_hidden_layer_decoder,
        dropout_rate=cfg.dropout_rate,
        factorized_representation=cfg.factorized_representation,
        initial_out_logvar=cfg.initial_out_logvar,
        learn_output_scale=cfg.learn_output_scale,
        learn_output_sample_scale=cfg.learn_output_sample_scale,
    )
