"""Split-operator solvers for dx/dt = (A(t) + B(t)) x.

TPU-native counterpart of ``/root/reference/src/exp/split_exp.rs:520-706``.
The operator-assembly callback is ``ops_fn(t) -> (La, Lb)``.

Reference-bug fix (SURVEY.md §2.3(7)): the reference's ``split_exp_midpoint``
scales KB[0] by dt/2 instead of dt (split_exp.rs:540-546; the commented-out
line 548-549 shows the intent) and samples the operators at t rather than
t + dt/2 (split_exp.rs:542). The default here is the *correct* Strang
midpoint e^{A dt/2} e^{B dt} e^{A dt/2} with midpoint sampling;
``strict_reference_compat=True`` reproduces the reference's literal behavior
(B at half weight, sampling at t) for parity experiments.

``split_cfm_step`` completes the reference's unfinished CFM-over-splits path
(the kernel exists at split_exp.rs:568-609 but its ExpSplitCFMSolver shell,
split_exp.rs:688-706, was never wired to any solver trait).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .protocol import ExponentialSplit


def split_midpoint_step(
    ops_fn, sp_a, sp_b, t, x, dt, *, strict_reference_compat=False
):
    """Strang-type split midpoint step (split_exp.rs:520-562)."""
    if strict_reference_compat:
        la, lb = ops_fn(t)                       # reference samples at t
        b_weight = 0.5 * dt                      # reference's dt/2 bug
    else:
        la, lb = ops_fn(t + 0.5 * dt)            # midpoint sampling
        b_weight = dt
    ua = sp_a.exp(sp_a.scale_l(la, 0.5 * dt))
    ub = sp_b.exp(sp_b.scale_l(lb, b_weight))
    y = sp_a.map_exp(ua, x)
    y = sp_b.map_exp(ub, y)
    y = sp_a.map_exp(ua, y)
    return y, None


def split_cfm_step(ops_fn, sp_a, sp_b, t, x, dt, rho, sigma, c):
    """BAB CFM step over a split (split_exp.rs:568-609).

    rho: (s, k) A-coefficients; sigma: (s+1, k) B-coefficients; c: (k,) nodes.
    x <- expB(sigma[s]) expA(rho[s-1]) ... expB(sigma[1]) expA(rho[0])
         expB(sigma[0]) x, each exponent dt * sum_j coeff[j] * L(t_j).
    """
    from .cfm import cfm_exp

    rho = np.asarray(rho)
    sigma = np.asarray(sigma)
    c = np.asarray(c)
    if rho.ndim != 2 or sigma.ndim != 2:
        raise ValueError(
            "split_cfm: rho and sigma must be 2-D (rows of quadrature "
            f"coefficients); got shapes {rho.shape} and {sigma.shape} — "
            "wrap a single row as ((...),)"
        )
    if rho.shape[1] != len(c) or sigma.shape[1] != len(c):
        raise ValueError("split_cfm: incompatible array dimensions")
    if sigma.shape[0] != rho.shape[0] + 1:
        raise ValueError("split_cfm: sigma must have one more row than rho")

    t_nodes = jnp.stack([t + float(ci) * dt for ci in c])
    l_nodes = jax.vmap(ops_fn)(t_nodes)
    va = [
        jax.tree_util.tree_map(lambda a, j=j: a[j], l_nodes[0])
        for j in range(len(c))
    ]
    vb = [
        jax.tree_util.tree_map(lambda a, j=j: a[j], l_nodes[1])
        for j in range(len(c))
    ]

    y = x
    for i in range(rho.shape[0]):
        y = cfm_exp(sp_b, y, dt, vb, sigma[i])
        y = cfm_exp(sp_a, y, dt, va, rho[i])
    y = cfm_exp(sp_b, y, dt, vb, sigma[-1])
    return y, None


@dataclasses.dataclass(frozen=True)
class SplitMidpoint:
    """Fixed-step split midpoint (ExpSplitMidpointSolver,
    split_exp.rs:613-685)."""

    sp_a: ExponentialSplit
    sp_b: ExponentialSplit
    strict_reference_compat: bool = False
    ops_fn: Callable = None

    nfev_per_step: int = 1

    def make_step_fn(self, ops_fn=None):
        fn = ops_fn if ops_fn is not None else self.ops_fn

        def step_fn(t, x, dt):
            return split_midpoint_step(
                fn, self.sp_a, self.sp_b, t, x, dt,
                strict_reference_compat=self.strict_reference_compat,
            )

        return step_fn


@dataclasses.dataclass(frozen=True)
class SplitCFM:
    """CFM-over-splits stepper (completes the reference's dead
    ExpSplitCFMSolver, split_exp.rs:688-706)."""

    sp_a: ExponentialSplit
    sp_b: ExponentialSplit
    rho: tuple
    sigma: tuple
    c: tuple
    ops_fn: Callable = None

    @property
    def nfev_per_step(self) -> int:
        return len(self.c)

    def make_step_fn(self, ops_fn=None):
        fn = ops_fn if ops_fn is not None else self.ops_fn

        def step_fn(t, x, dt):
            return split_cfm_step(
                fn, self.sp_a, self.sp_b, t, x, dt,
                self.rho, self.sigma, self.c,
            )

        return step_fn
