"""Expert-fusion primitives: PoE, alpha-PoE, masked 2^M subset fusion, MoE
mixture selection, and the group divergences.

Reference semantics: ``experiments/divergence_measures/mm_div.py:13-123`` and
``experiments/utils/utils.py:63-85``. The key TPU-first redesign is
:func:`masked_poe_all_subsets`: the reference loops over the modality powerset
in Python concatenating tensors per subset (``BaseMMVae.py:190-216``); here
every modality is encoded once into stacked ``[M, B, D]`` arrays and *all*
subset posteriors are produced by a single masked-precision einsum that XLA
maps straight onto the MXU.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .gaussian import kl_divergence, kl_divergence_per_sample


def poe(mus, logvars, eps: float = 1e-8):
    """Precision-weighted product of Gaussian experts over axis 0.

    ``mm_div.py:poe``: ``T = 1/(exp(logvar)+eps)``; the fused mean is the
    precision-weighted average of the expert means and the fused variance the
    inverse total precision.
    """
    var = jnp.exp(logvars) + eps
    t = 1.0 / var
    t_sum = jnp.sum(t, axis=0)
    pd_mu = jnp.sum(mus * t, axis=0) / t_sum
    pd_var = 1.0 / t_sum
    return pd_mu, jnp.log(pd_var)


def alpha_poe(alpha, mus, logvars, eps: float = 1e-8):
    """Weighted PoE used as the JSD dynamic prior (``mm_div.py:alpha_poe``).

    Static (list/numpy) alphas are reshaped at trace time so the kernel sees
    a rank-3 constant — Mosaic cannot lower a rank-1 -> rank-3 reshape
    (``tpu.reshape vector<3xf32> -> vector<3x1x1xf32>``), which is what kept
    jsd off the fused TPU path."""
    var = jnp.exp(logvars) + eps
    t = 1.0 / var
    shape = (-1,) + (1,) * (mus.ndim - 1)
    if isinstance(alpha, jnp.ndarray):
        alpha = jnp.reshape(alpha, shape)
    else:
        alpha = np.reshape(np.asarray(alpha, dtype=np.float32), shape)
    pd_var = 1.0 / jnp.sum(alpha * t, axis=0)
    pd_mu = pd_var * jnp.sum(alpha * mus * t, axis=0)
    return pd_mu, jnp.log(pd_var)


def masked_poe_all_subsets(mus, logvars, subset_mask, prior_expert,
                           eps: float = 1e-8):
    """Fuse all modality subsets at once via masked precision sums.

    Args:
      mus, logvars: ``[M, B, D]`` stacked per-modality posteriors.
      subset_mask: ``[S, M]`` 0/1 matrix; row s selects the experts of
        subset s.
      prior_expert: ``[S]`` 0/1 vector; 1 adds a unit-Gaussian expert
        (``mu=0, logvar=0``) to that subset's product, replicating
        ``BaseMMVae.poe_fusion``'s appended prior row (``BaseMMVae.py:109-118``).
      eps: precision stabilizer matching the reference.

    Returns:
      ``(pd_mu, pd_logvar)`` each ``[S, B, D]``.

    Missing modalities are handled upstream by zeroing their mask column,
    which is exactly "infinite variance expert" semantics.
    """
    t = 1.0 / (jnp.exp(logvars) + eps)  # [M, B, D]
    prior_t = 1.0 / (1.0 + eps)  # unit expert: var = exp(0) + eps
    mu_t = mus * t
    if isinstance(subset_mask, np.ndarray) and subset_mask.shape[0] <= 16:
        # static mask: unroll the tiny (S x M) contraction into adds — same
        # XLA fusion, and it avoids a 3-D einsum Mosaic cannot lower
        rows_t, rows_mu = [], []
        prior_np = np.asarray(prior_expert)
        for s_row in range(subset_mask.shape[0]):
            terms_t = [t[m] for m in range(subset_mask.shape[1])
                       if subset_mask[s_row, m]]
            terms_mu = [mu_t[m] for m in range(subset_mask.shape[1])
                        if subset_mask[s_row, m]]
            ts = sum(terms_t[1:], terms_t[0])
            ms = sum(terms_mu[1:], terms_mu[0])
            if prior_np[s_row]:
                ts = ts + prior_t
            rows_t.append(ts)
            rows_mu.append(ms)
        t_sum = jnp.stack(rows_t)
        mu_sum = jnp.stack(rows_mu)
    else:
        subset_mask = jnp.asarray(subset_mask, dtype=mus.dtype)
        prior_expert_j = jnp.asarray(prior_expert, dtype=mus.dtype)
        t_sum = jnp.einsum("sm,mbd->sbd", subset_mask, t)
        t_sum = t_sum + prior_expert_j[:, None, None] * prior_t
        mu_sum = jnp.einsum("sm,mbd->sbd", subset_mask, mu_t)
    pd_mu = mu_sum / t_sum
    pd_logvar = -jnp.log(t_sum)
    return pd_mu, pd_logvar


def mixture_partition(num_components: int, num_samples: int,
                      weights: Sequence[float] | None = None):
    """Static row partition used by stratified mixture selection.

    Replicates ``utils/utils.py:mixture_component_selection``'s index
    arithmetic exactly: component k owns rows ``[start_k, end_k)`` with
    ``end_k - start_k = floor(num_samples * w_k)`` and the final component
    absorbing the remainder. Returns a numpy int array ``owner[num_samples]``
    mapping each row to its owning component — computed at trace time so the
    device-side op is a single static gather.
    """
    if weights is None:
        weights = [1.0 / num_components] * num_components
    weights = [float(w) for w in weights]
    total = sum(weights)
    weights = [w / total for w in weights]
    starts, ends = [], []
    for k in range(num_components):
        start = 0 if k == 0 else ends[k - 1]
        if k == num_components - 1:
            end = num_samples
        else:
            end = start + int(math.floor(num_samples * weights[k]))
        starts.append(start)
        ends.append(end)
    ends[-1] = num_samples
    owner = np.zeros(num_samples, dtype=np.int32)
    for k in range(num_components):
        owner[starts[k]:ends[k]] = k
    return owner


def mixture_component_selection(mus, logvars, weights=None):
    """Stratified MoE sample selection (``utils/utils.py:63-85``).

    Deterministically partitions the batch across the stacked components
    proportionally to ``weights`` and gathers each row's (mu, logvar) from its
    owning component. ``mus``/``logvars`` are ``[K, B, D]``; weights must be
    static Python floats (they always are: uniform over a static K).
    """
    k, b, _ = mus.shape
    owner = mixture_partition(k, b, weights)
    # one-hot masked sum instead of a 3-D gather: identical result, and it
    # lowers everywhere (Mosaic supports only 2-D gathers)
    onehot = jnp.asarray(np.eye(k, dtype=np.float32)[owner].T)  # [K, B]
    sel = onehot[:, :, None]
    return jnp.sum(sel * mus, axis=0), jnp.sum(sel * logvars, axis=0)


def group_divergence_moe(mus, logvars, weights, normalization=None):
    """Weighted sum of per-component KLs to the unit prior
    (``mm_div.py:calc_group_divergence_moe``).

    ``mus``/``logvars``: ``[K, B, D]``. With ``normalization`` (batch size)
    each component KL is the total sum over its batch divided by it; without,
    KLs stay per-sample ``[K, B]``.
    """
    weights = jnp.asarray(weights)
    if normalization is not None:
        klds = jnp.stack([
            kl_divergence(mus[k], logvars[k], norm_value=normalization)
            for k in range(mus.shape[0])
        ])
        group_div = jnp.sum(weights * klds)
    else:
        klds = kl_divergence_per_sample(mus, logvars)  # [K, B]
        group_div = jnp.sum(weights[:, None] * klds, axis=0)
    return group_div, klds


def alpha_jsd_divergence(mus, logvars, weights, normalization=None):
    """JSD dynamic-prior divergence (``mm_div.py:calc_alphaJSD_modalities``).

    Each expert's KL is taken against the alpha-PoE of all experts.
    Returns ``(group_div, klds, (prior_mu, prior_logvar))``.
    """
    if not isinstance(weights, jnp.ndarray):
        # static alphas (cfg.alpha_modalities) stay host-side constants so
        # the fused kernels never trace a rank-changing reshape
        weights = np.asarray(weights, dtype=np.float32)
    prior_mu, prior_logvar = alpha_poe(weights, mus, logvars)
    # one stacked per-sample KL against the broadcast prior instead of a
    # per-component python loop of full-sum KLs (fewer ops; also the loop
    # form crashed the Mosaic compile helper inside fused kernels)
    klds_ps = kl_divergence_per_sample(
        mus, logvars, prior_mu[None], prior_logvar[None])  # [K, B]
    if normalization is not None:
        klds = jnp.sum(klds_ps, axis=1) / float(normalization)  # [K]
        group_div = jnp.sum(weights * klds)
    else:
        klds = klds_ps
        group_div = jnp.sum(weights[:, None] * klds, axis=0)
    return group_div, klds, (prior_mu, prior_logvar)


def group_divergence_poe(mus, logvars, normalization=None):
    """PoE-posterior KL plus per-expert KLs
    (``mm_div.py:calc_group_divergence_poe``; defined for completeness)."""
    poe_mu, poe_logvar = poe(mus, logvars)
    kld_poe = kl_divergence(poe_mu, poe_logvar, norm_value=normalization)
    klds = jnp.stack([
        kl_divergence(mus[k], logvars[k], norm_value=normalization)
        for k in range(mus.shape[0])
    ])
    return kld_poe, klds, (poe_mu, poe_logvar)


def reweight_weights(w):
    """Normalize weights to sum to one (``utils/utils.py:reweight_weights``).

    Static (list/numpy) weights stay host-side numpy so downstream reshapes
    happen at trace time (see :func:`alpha_poe`)."""
    if isinstance(w, jnp.ndarray):
        return w / jnp.sum(w)
    w = np.asarray(w, dtype=np.float32)
    return w / np.sum(w)
