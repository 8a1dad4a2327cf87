"""Low-level TPU compute ops (XLA + Pallas kernels)."""

from . import cplx
from .cplx import Cplx
from .expm import expm, expm_apply, expm_frechet

__all__ = ["cplx", "Cplx", "expm", "expm_apply", "expm_frechet"]
