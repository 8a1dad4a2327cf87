"""Utilities: precision policy, profiling helpers."""

from . import prec

__all__ = ["prec"]
