"""Gaussian math primitives (KL divergences, log-pdfs, reparameterization).

Semantics follow the reference implementation
(``experiments/divergence_measures/kl_div.py:7-14``,
``experiments/utils/BaseMMVae.py:37-40``,
``experiments/utils/likelihood.py:40-79``) but are written as pure, batched
jax.numpy functions so every call site fuses into the surrounding jitted
computation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)


def kl_divergence(mu0, logvar0, mu1=None, logvar1=None, norm_value=None):
    """Closed-form Gaussian KL, summed over every element.

    ``KL(N(mu0, e^logvar0) || N(0, I))`` when ``mu1``/``logvar1`` are None,
    otherwise the general two-Gaussian KL. Mirrors
    ``kl_div.py:calc_kl_divergence`` including the ``norm_value`` batch
    normalization (reference divides the *total* sum by the batch size).
    """
    if mu1 is None or logvar1 is None:
        kld = -0.5 * jnp.sum(1.0 - jnp.exp(logvar0) - jnp.square(mu0) + logvar0)
    else:
        kld = -0.5 * jnp.sum(
            1.0
            - jnp.exp(logvar0 - logvar1)
            - jnp.square(mu0 - mu1) / jnp.exp(logvar1)
            + logvar0
            - logvar1
        )
    if norm_value is not None:
        kld = kld / float(norm_value)
    return kld


def kl_divergence_per_sample(mu0, logvar0, mu1=None, logvar1=None):
    """Per-sample KL (summed over the trailing feature axis only)."""
    if mu1 is None or logvar1 is None:
        per_el = -0.5 * (1.0 - jnp.exp(logvar0) - jnp.square(mu0) + logvar0)
    else:
        per_el = -0.5 * (
            1.0
            - jnp.exp(logvar0 - logvar1)
            - jnp.square(mu0 - mu1) / jnp.exp(logvar1)
            + logvar0
            - logvar1
        )
    return jnp.sum(per_el, axis=-1)


def gaussian_entropy(logvar, norm_value=None):
    """Gaussian entropy, ``kl_div.py:calc_entropy_gauss`` semantics."""
    ent = 0.5 * jnp.sum(LOG2PI + logvar + 1.0)
    if norm_value is not None:
        ent = ent / float(norm_value)
    return ent


def reparameterize(rng, mu, logvar):
    """``z = mu + eps * exp(0.5*logvar)`` (``BaseMMVae.py:37-40``)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, shape=mu.shape, dtype=mu.dtype)
    return mu + eps * std


def gaussian_log_pdf(x, mu, logvar):
    """Diagonal Gaussian log-density summed over the last axis.

    Mirrors ``utils/likelihood.py:gaussian_log_pdf`` (sums over axis 1 of a
    2-D input; here: the trailing axis, so it vmaps cleanly).
    """
    log_pdf = -0.5 * LOG2PI - logvar / 2.0 - jnp.square(x - mu) / (
        2.0 * jnp.exp(logvar)
    )
    return jnp.sum(log_pdf, axis=-1)


def unit_gaussian_log_pdf(x):
    """Standard-normal log-density summed over the last axis
    (``utils/likelihood.py:unit_gaussian_log_pdf``)."""
    log_pdf = -0.5 * LOG2PI - jnp.square(x) / 2.0
    return jnp.sum(log_pdf, axis=-1)


def log_mean_exp(x, axis=1):
    """``log(mean(exp(x)))`` stabilized (``utils/likelihood.py:log_mean_exp``)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    return m + jnp.log(jnp.mean(jnp.exp(x - m), axis=axis, keepdims=True))
