"""Auxiliary divergence measures from the reference inventory.

These complete the reference's divergence-measures surface beyond the main
training path: the Gaussian-mixture KL bounds used by the two-modality JSD
variant (``experiments/divergence_measures/kl_div.py:17-111``), the pairwise
modality-divergence matrix (``mm_div.py:126-151``) and the WAE-style
inverse-multiquadratic MMD (``mmd.py:1-43``; dead code upstream, kept for API
parity).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

from .fusion import reweight_weights
from .gaussian import gaussian_entropy, kl_divergence

PI = math.pi


def gaussian_scaling_factor(mu1, logvar1, mu2=None, logvar2=None,
                            norm_value=None):
    """``kl_div.py:calc_gaussian_scaling_factor`` (``:17-35``)."""
    d = mu1.shape[1]
    if mu2 is None or logvar2 is None:
        s_pre = (1.0 / (2.0 * PI) ** (d / 2.0)) * jnp.sqrt(
            jnp.sum(jnp.exp(logvar1) + 1.0, axis=1))
        s = s_pre * jnp.sum(
            jnp.exp(-0.5 * jnp.square(mu1) / (jnp.exp(logvar1) + 1.0)),
            axis=1)
    else:
        s_pre = jnp.sqrt(jnp.sum(
            1.0 / ((2.0 * PI) ** (d / 2.0)
                   * (jnp.exp(logvar1) + jnp.exp(logvar2))), axis=1))
        s = s_pre * jnp.sum(
            jnp.exp(-0.5 * jnp.square(mu1 - mu2)
                    / (jnp.exp(logvar1) + jnp.exp(logvar2))), axis=1)
    s = jnp.sum(s)
    if norm_value is not None:
        s = s / float(norm_value)
    return s


def gaussian_scaling_factor_self(logvar1, norm_value=None):
    """``kl_div.py:calc_gaussian_scaling_factor_self`` (``:38-46``)."""
    d = logvar1.shape[1]
    s = (1.0 / (2.0 * PI) ** (d / 2.0)) * jnp.sqrt(
        jnp.sum(jnp.exp(logvar1), axis=1))
    s = jnp.sum(s)
    if norm_value is not None:
        s = s / float(norm_value)
    return s


def kl_divergence_lb_gauss_mixture(alpha_modalities: Sequence[float], index,
                                   mu1, logvar1, mus, logvars,
                                   norm_value=None):
    """Lower bound of KL to a Gaussian mixture
    (``kl_div.py:calc_kl_divergence_lb_gauss_mixture``, ``:64-80``)."""
    w = reweight_weights(jnp.asarray(alpha_modalities))
    denom = w[0] * gaussian_scaling_factor(mu1, logvar1,
                                           norm_value=norm_value)
    for k in range(len(mus)):
        if index == k:
            denom = denom + w[k + 1] * gaussian_scaling_factor_self(
                logvar1, norm_value=norm_value)
        else:
            denom = denom + w[k + 1] * gaussian_scaling_factor(
                mu1, logvar1, mus[k], logvars[k], norm_value=norm_value)
    return -jnp.log(denom)


def kl_divergence_ub_gauss_mixture(alpha_modalities: Sequence[float], index,
                                   mu1, logvar1, mus, logvars, entropy,
                                   norm_value=None):
    """Upper bound of KL to a Gaussian mixture
    (``kl_div.py:calc_kl_divergence_ub_gauss_mixture``, ``:83-103``)."""
    w = reweight_weights(jnp.asarray(alpha_modalities))
    nom = gaussian_scaling_factor_self(logvar1, norm_value=norm_value)
    kl_uniform = kl_divergence(mu1, logvar1, norm_value=norm_value)
    denom = w[0] * jnp.minimum(jnp.exp(kl_uniform), 1e5)
    for k in range(len(mus)):
        if index == k:
            denom = denom + w[k + 1]
        else:
            kl_k = kl_divergence(mu1, logvar1, mus[k], logvars[k],
                                 norm_value=norm_value)
            denom = denom + w[k + 1] * jnp.minimum(jnp.exp(kl_k), 1e5)
    return jnp.log(nom) - jnp.log(denom) + entropy


def alpha_jsd_modalities_mixture(m1_mu, m1_logvar, m2_mu, m2_logvar,
                                 alpha_modalities, batch_size):
    """Two-modality JSD via averaged mixture-KL bounds
    (``mm_div.py:calc_alphaJSD_modalities_mixture``, ``:38-66``)."""
    w_modalities = reweight_weights(jnp.asarray(alpha_modalities[1:]))
    mus = [m1_mu, m2_mu]
    logvars = [m1_logvar, m2_logvar]
    klds = []
    entropies = []
    for k in range(2):
        ent = gaussian_entropy(logvars[k], norm_value=batch_size)
        lb = kl_divergence_lb_gauss_mixture(
            alpha_modalities, k, mus[k], logvars[k], mus, logvars,
            norm_value=batch_size)
        ub = kl_divergence_ub_gauss_mixture(
            alpha_modalities, k, mus[k], logvars[k], mus, logvars, ent,
            norm_value=batch_size)
        entropies.append(ent)
        klds.append(0.5 * (lb + ub))
    klds = jnp.stack(klds)
    summed = jnp.sum(w_modalities * klds)
    return summed, klds, jnp.stack(entropies)


def modality_divergence(m1_mu, m1_logvar, m2_mu, m2_logvar,
                        modality_poe: bool = False):
    """Pairwise KL matrix between modality posteriors
    (``mm_div.py:calc_modality_divergence``, ``:126-151``)."""
    n = len(m1_mu)
    if modality_poe:
        return kl_divergence(m1_mu, m1_logvar, m2_mu, m2_logvar,
                             norm_value=n)
    uniform_mu = jnp.zeros_like(m1_mu)
    uniform_lv = jnp.zeros_like(m1_logvar)
    mus = [uniform_mu, m1_mu, m2_mu]
    logvars = [uniform_lv, m1_logvar, m2_logvar]
    klds = jnp.zeros((3, 3))
    klds_modonly = jnp.zeros((2, 2))
    for i in range(1, 3):
        for j in range(3):
            kld = kl_divergence(mus[i], logvars[i], mus[j], logvars[j],
                                norm_value=n)
            klds = klds.at[i, j].set(kld)
            if i >= 1 and j >= 1:
                klds_modonly = klds_modonly.at[i - 1, j - 1].set(kld)
    klds_sum = jnp.sum(klds) / (3 * 2)
    klds_modonly_sum = jnp.sum(klds_modonly) / 4
    return klds_sum, klds_modonly_sum


def im_kernel_sum(z1, z2, zvar: float, exclude_diag: bool = True):
    """Inverse-multiquadratic kernel sum (``mmd.py:im_kernel_sum``)."""
    z_dim = z1.shape[1]
    c = 2.0 * z_dim * zvar
    d2 = jnp.sum(jnp.square(z1[:, None, :] - z2[None, :, :]), axis=-1)
    k = c / (c + d2)
    total = jnp.sum(k)
    if exclude_diag:
        total = total - jnp.trace(k)
    return total


def mmd_loss(sample_qz, sample_pz, zvar: float = 1.0):
    """WAE inverse-multiquadratic MMD (``mmd.py:mmd_loss``; dead code
    upstream, implemented for inventory parity)."""
    n = sample_qz.shape[0]
    stat = (im_kernel_sum(sample_qz, sample_qz, zvar) / (n * (n - 1))
            + im_kernel_sum(sample_pz, sample_pz, zvar) / (n * (n - 1))
            - 2.0 * im_kernel_sum(sample_qz, sample_pz, zvar,
                                  exclude_diag=False) / (n * n))
    return stat
