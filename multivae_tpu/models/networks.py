"""Per-modality encoder/decoder MLPs (flax).

Semantics of ``experiments/multimodal_cohort/networks/networks.py:4-77``:

* Encoder: ``input -> [Dense(256) + ReLU + Dropout] * num_hidden_layer_encoder
  -> {style_mu, style_logvar} (optional), {class_mu, class_logvar}``.
* Decoder: ``concat(style_z, class_z) -> [Dense(256) + ReLU + Dropout] *
  num_hidden_layer_decoder -> out_mu``; the output log-variance is one of
  three modes — a per-sample Dense head (``learn_output_sample_scale``), a
  learned per-feature parameter, or a frozen per-feature constant
  (``initial_out_logvar``; grad gated by ``learn_output_scale``). Returns
  ``(x_hat, scale = exp(0.5 * logvar))``.

Initialization follows torch ``nn.Linear`` defaults (Kaiming-uniform weights,
uniform bias in ``±1/sqrt(fan_in)``) so trained statistics line up with the
reference to tolerance.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform (a=sqrt(5)) as torch nn.Linear uses: U(±sqrt(1/fan_in)).

    flax kernels are [fan_in, fan_out]."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_linear_bias_init(fan_in):
    bound = 1.0 / jnp.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dense(features: int, fan_in: int, name: str) -> nn.Dense:
    return nn.Dense(features, name=name,
                    kernel_init=_torch_linear_kernel_init,
                    bias_init=_torch_linear_bias_init(fan_in))


class Encoder(nn.Module):
    """Shared-trunk encoder with content (class) and optional style heads."""

    input_dim: int
    class_dim: int
    style_dim: int
    hidden_dim: int = 256
    num_hidden_layers: int = 1
    dropout_rate: float = 0.0
    factorized: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = x
        width = self.input_dim
        for i in range(self.num_hidden_layers):
            h = _dense(self.hidden_dim, width, f"hidden_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            width = self.hidden_dim
        # all heads fused into one projection (the step is kernel-count
        # bound on TPU); slices recover the reference's four heads, whose
        # torch-Linear init law depends only on fan_in, so the fused kernel
        # is distributionally identical
        has_style = self.factorized and self.style_dim > 0
        s = self.style_dim if has_style else 0
        heads = _dense(2 * self.class_dim + 2 * s, width, "heads")(h)
        class_mu = heads[..., :self.class_dim]
        class_logvar = heads[..., self.class_dim:2 * self.class_dim]
        style_mu = style_logvar = None
        if has_style:
            style_mu = heads[..., 2 * self.class_dim:2 * self.class_dim + s]
            style_logvar = heads[..., 2 * self.class_dim + s:]
        return style_mu, style_logvar, class_mu, class_logvar


class Decoder(nn.Module):
    """Decoder from (style, class) latents to output sufficient statistics."""

    output_dim: int
    class_dim: int
    style_dim: int
    hidden_dim: int = 256
    num_hidden_layers: int = 0
    dropout_rate: float = 0.0
    factorized: bool = True
    initial_out_logvar: float = -3.0
    learn_output_scale: bool = True
    learn_output_sample_scale: bool = False

    @nn.compact
    def __call__(self, style_z: Optional[jnp.ndarray], class_z: jnp.ndarray,
                 *, train: bool = False):
        if self.factorized and self.style_dim > 0:
            z = jnp.concatenate([style_z, class_z], axis=-1)
            width = self.style_dim + self.class_dim
        else:
            z = class_z
            width = self.class_dim
        h = z
        for i in range(self.num_hidden_layers):
            h = _dense(self.hidden_dim, width, f"hidden_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            width = self.hidden_dim
        if self.learn_output_sample_scale:
            # fused mu+logvar projection (single matmul)
            both = _dense(2 * self.output_dim, width, "out_heads")(h)
            x_hat = both[..., :self.output_dim]
            logvar = both[..., self.output_dim:]
        else:
            x_hat = _dense(self.output_dim, width, "out_mu")(h)
            logvar = self.param(
                "out_logvar",
                lambda key, shape: jnp.full(shape, self.initial_out_logvar),
                (1, self.output_dim))
            if not self.learn_output_scale:
                logvar = jax.lax.stop_gradient(logvar)
            logvar = jnp.broadcast_to(logvar, x_hat.shape)
        scale = jnp.exp(0.5 * logvar)
        return x_hat, scale
