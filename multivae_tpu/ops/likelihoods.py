"""Output-likelihood log-probabilities.

The reference maps a likelihood name to a ``torch.distributions`` family
(``experiments/modalities/modality.py:18-30``) and scores reconstructions with
``dist.log_prob(target).sum() / norm`` (``modality.py:42-45``). Here each
family is a pure function of the decoder's ``(loc, scale)`` sufficient
statistics so the whole reconstruction term fuses into the jitted step.

Note the decoder emits ``scale = exp(0.5 * logvar)`` (``networks.py:77``); the
Normal/Laplace log-probs below therefore take ``scale`` (not logvar).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)

LIKELIHOODS = ("normal", "laplace", "bernoulli", "categorical")


def normal_log_prob(x, loc, scale):
    """Elementwise ``Normal(loc, scale).log_prob(x)``."""
    var = jnp.square(scale)
    return -0.5 * (LOG2PI + jnp.log(var)) - jnp.square(x - loc) / (2.0 * var)


def laplace_log_prob(x, loc, scale):
    """Elementwise ``Laplace(loc, scale).log_prob(x)``."""
    return -jnp.log(2.0 * scale) - jnp.abs(x - loc) / scale


def bernoulli_log_prob(x, logits):
    """Elementwise ``Bernoulli(logits).log_prob(x)``."""
    # log p = x*log(sigmoid(l)) + (1-x)*log(1-sigmoid(l))
    return x * jax.nn.log_sigmoid(logits) + (1.0 - x) * jax.nn.log_sigmoid(-logits)


def categorical_log_prob(x_onehot, logits):
    """``OneHotCategorical(logits).log_prob(x)`` (summed over classes)."""
    return jnp.sum(x_onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)


def log_prob(name: str, x, loc, scale):
    """Dispatch on the likelihood family name; returns elementwise log-probs
    (Categorical: already class-reduced)."""
    if name == "normal":
        return normal_log_prob(x, loc, scale)
    if name == "laplace":
        return laplace_log_prob(x, loc, scale)
    if name == "bernoulli":
        return bernoulli_log_prob(x, loc)
    if name == "categorical":
        return categorical_log_prob(x, loc)
    raise ValueError(f"likelihood not implemented: {name}")


def calc_log_prob(name: str, x, loc, scale, norm_value):
    """``out_dist.log_prob(target).sum() / norm_value``
    (``modality.py:calc_log_prob``)."""
    return jnp.sum(log_prob(name, x, loc, scale)) / norm_value


def sample(name: str, rng, loc, scale):
    """Draw a sample from the output distribution (used by DAA's
    likelihood sampling strategy, ``workflow.py:401-405``)."""
    if name == "normal":
        return loc + scale * jax.random.normal(rng, loc.shape, loc.dtype)
    if name == "laplace":
        u = jax.random.uniform(rng, loc.shape, loc.dtype, 1e-7, 1.0 - 1e-7) - 0.5
        return loc - scale * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))
    if name == "bernoulli":
        return jax.random.bernoulli(rng, jax.nn.sigmoid(loc)).astype(loc.dtype)
    if name == "categorical":
        idx = jax.random.categorical(rng, loc)
        return jax.nn.one_hot(idx, loc.shape[-1], dtype=loc.dtype)
    raise ValueError(f"likelihood not implemented: {name}")
