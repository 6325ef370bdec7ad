"""Visualization layer (matplotlib; optional nilearn surface rendering)."""

from .plotting import (
    plot_areas,
    plot_bar,
    plot_cmat,
    plot_coefs,
    plot_mosaic,
    plot_radar,
    plot_surf_mosaic,
)

__all__ = ["plot_areas", "plot_bar", "plot_cmat", "plot_coefs",
           "plot_mosaic", "plot_radar", "plot_surf_mosaic"]
