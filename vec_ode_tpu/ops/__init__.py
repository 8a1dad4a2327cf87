"""Low-level TPU compute ops (XLA + Pallas kernels)."""

from .expm import expm, expm_apply, expm_frechet

__all__ = ["expm", "expm_apply", "expm_frechet"]
