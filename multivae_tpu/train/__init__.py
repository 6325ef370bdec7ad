"""Training layer: config, losses, jitted train step, epoch runner."""

from .config import Config, METHODS

__all__ = ["Config", "METHODS"]
