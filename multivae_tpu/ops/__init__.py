"""Math primitives for the multimodal-VAE stack (pure jnp + Pallas)."""

from .gaussian import (
    LOG2PI,
    gaussian_entropy,
    gaussian_log_pdf,
    kl_divergence,
    kl_divergence_per_sample,
    log_mean_exp,
    reparameterize,
    unit_gaussian_log_pdf,
)
from .fusion import (
    alpha_jsd_divergence,
    alpha_poe,
    group_divergence_moe,
    group_divergence_poe,
    masked_poe_all_subsets,
    mixture_component_selection,
    mixture_partition,
    poe,
    reweight_weights,
)
from .likelihoods import (
    LIKELIHOODS,
    calc_log_prob,
    log_prob,
    sample,
)

__all__ = [
    "LOG2PI",
    "LIKELIHOODS",
    "alpha_jsd_divergence",
    "alpha_poe",
    "calc_log_prob",
    "gaussian_entropy",
    "gaussian_log_pdf",
    "group_divergence_moe",
    "group_divergence_poe",
    "kl_divergence",
    "kl_divergence_per_sample",
    "log_mean_exp",
    "log_prob",
    "masked_poe_all_subsets",
    "mixture_component_selection",
    "mixture_partition",
    "poe",
    "reparameterize",
    "reweight_weights",
    "sample",
    "unit_gaussian_log_pdf",
]

from .divergences_extra import (
    alpha_jsd_modalities_mixture,
    gaussian_scaling_factor,
    gaussian_scaling_factor_self,
    im_kernel_sum,
    kl_divergence_lb_gauss_mixture,
    kl_divergence_ub_gauss_mixture,
    mmd_loss,
    modality_divergence,
)

__all__ += [
    "alpha_jsd_modalities_mixture",
    "gaussian_scaling_factor",
    "gaussian_scaling_factor_self",
    "im_kernel_sum",
    "kl_divergence_lb_gauss_mixture",
    "kl_divergence_ub_gauss_mixture",
    "mmd_loss",
    "modality_divergence",
]
