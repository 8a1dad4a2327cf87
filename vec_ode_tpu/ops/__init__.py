"""Low-level TPU compute ops (XLA + Pallas kernels)."""

from . import cplx
from .cplx import Cplx
from .expm import expm, expm_apply, expm_frechet
from .pallas_expmv import chain_expmv_pallas, chain_expmv_xla
from .pallas_rk import FusedModulatedLinearRK, fused_rk_step, xla_rk_step

__all__ = [
    "cplx",
    "Cplx",
    "expm",
    "expm_apply",
    "expm_frechet",
    "FusedModulatedLinearRK",
    "fused_rk_step",
    "xla_rk_step",
    "chain_expmv_pallas",
    "chain_expmv_xla",
]
