"""Model layer: modality specs, flax encoder/decoder MLPs, MultimodalVAE."""

from .modalities import (
    ModalitySpec,
    available_subsets,
    clinical,
    make_modalities,
    powerset_subsets,
    rois,
)
from .networks import Decoder, Encoder
from .mmvae import MultimodalVAE, build_model

__all__ = [
    "Decoder",
    "Encoder",
    "ModalitySpec",
    "MultimodalVAE",
    "available_subsets",
    "build_model",
    "clinical",
    "make_modalities",
    "powerset_subsets",
    "rois",
]
