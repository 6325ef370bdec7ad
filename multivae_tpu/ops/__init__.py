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
