"""Utilities: precision policy, checkpointing, native oracle loader."""

from . import checkpointing, oracle, prec

__all__ = ["prec", "checkpointing", "oracle"]
