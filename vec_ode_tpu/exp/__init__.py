"""Exponential / geometric integrators for linear systems dx/dt = A(t) x.

Counterpart of the reference's ``src/exp`` module tree, plus the concrete
operator leaves the reference never shipped (SURVEY.md §1).
"""

from .auto import auto_modulated
from .cfm import CFM, CFM4, CFM4_BLANES17, cfm_exp, cfm_step
from .leaves import (
    AntiHermitianCplxSplit,
    AntiHermitianSplit,
    DenseCplxSplit,
    DenseSplit,
    DiagonalCplxSplit,
    DiagonalSplit,
)
from .magnus import (ExpMidpoint, Magnus4, Magnus6, magnus4_step,
                     magnus6_step, midpoint_step)
from .modulated import (
    CFM4Modulated,
    CFMModulated,
    MagnusModulated4,
    MagnusModulated6,
    MidpointModulated,
    ModulatedOperator,
    modulated_exp_apply,
)
from .protocol import ExponentialSplit, index_u
from .split_solvers import (
    SplitCFM,
    SplitMidpoint,
    split_cfm_step,
    split_midpoint_step,
)
from .splits import (
    CommutativeSplit,
    RKNR4Split,
    SemiComplexO4Split,
    StrangSplit,
    TripleJumpSplit,
)

__all__ = [
    "ExponentialSplit",
    "index_u",
    "DenseSplit",
    "DiagonalSplit",
    "AntiHermitianSplit",
    "AntiHermitianCplxSplit",
    "DenseCplxSplit",
    "DiagonalCplxSplit",
    "CommutativeSplit",
    "StrangSplit",
    "SemiComplexO4Split",
    "TripleJumpSplit",
    "RKNR4Split",
    "ExpMidpoint",
    "Magnus4",
    "Magnus6",
    "midpoint_step",
    "magnus4_step",
    "magnus6_step",
    "CFM",
    "CFM4",
    "CFM4_BLANES17",
    "cfm_exp",
    "cfm_step",
    "SplitMidpoint",
    "SplitCFM",
    "split_midpoint_step",
    "split_cfm_step",
    "auto_modulated",
    "ModulatedOperator",
    "modulated_exp_apply",
    "MidpointModulated",
    "MagnusModulated4",
    "MagnusModulated6",
    "CFMModulated",
    "CFM4Modulated",
]
