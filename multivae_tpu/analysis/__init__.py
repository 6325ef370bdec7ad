"""Interpretability analyses: DAA, RSA, ANOVA, univariate baselines, stats."""

from . import anova, avatars, daa, rsa, stats

__all__ = ["anova", "avatars", "daa", "rsa", "stats"]
