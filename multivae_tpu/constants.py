"""Backward-compat shim; see multivae_tpu.data.cohorts."""

from .data.cohorts import (  # noqa: F401
    get_short_clinical_names,
    indices,
    modalities,
    short_clinical_names,
)
