"""Exponential midpoint (Magnus-2) and adaptive Magnus-4 steppers.

TPU-native counterpart of ``/root/reference/src/exp/magnus.rs``. Both solve
the linear system dx/dt = A(t) x where the user supplies an operator-assembly
function ``op_fn(t) -> L`` (scalar time in, operator pytree out); solvers that
need several time samples ``vmap`` it over the quadrature nodes, turning the
reference's Vec-of-operators callback (magnus.rs:32) into one batched
assembly.

Reference-bug fix (SURVEY.md §2.3(6)): the reference's adaptive Magnus-4 norms
a stale buffer (``adaptive_dat.dx`` initialized to x0 and never updated,
magnus.rs:180-184 vs 274-276) so its step control is keyed off a constant. We
return the actual error vector xe = e^{Ω1} x0 - e^{Ω} x0 (magnus.rs:76-79) to
the driver, which norms it — the *intended* behavior.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax

from .protocol import ExponentialSplit

# Gauss-Legendre 2-node half-offset: 1/(2 sqrt(3)) (magnus.rs:42).
_C_MID = 0.5 / math.sqrt(3.0)
# Magnus-4 commutator weight: -sqrt(3)/12 (magnus.rs:44-45).
_B2 = -math.sqrt(3.0) / 12.0
# Yoshida triple-jump exponents: composing the SYMMETRIC Magnus-4 step
# over [g1, 1-2g1, g1]*dt with g1 = 1/(2 - 2^{1/5}) raises the order to 6
# (no such scheme exists in the reference — beyond-parity capability).
_G1 = 1.0 / (2.0 - 2.0 ** 0.2)
_SUB_OFF = (0.0, _G1, 1.0 - _G1)
_SUB_LEN = (_G1, 1.0 - 2.0 * _G1, _G1)


def midpoint_step(op_fn, split: ExponentialSplit, t, x, dt):
    """xf = exp(dt * A(t + dt/2)) x — magnus.rs:10-26."""
    l_mid = op_fn(t + 0.5 * dt)
    u = split.exp(split.scale_l(l_mid, dt))
    return split.map_exp(u, x), None


def _m4_omega(op_fn, split: ExponentialSplit, t, dt):
    """The Magnus-4 exponent Ω over [t, t+dt] (GL2 nodes) — magnus.rs:46-61."""
    t_mid = t + 0.5 * dt
    t_nodes = jax.numpy.stack(
        [t_mid - _C_MID * dt, t_mid + _C_MID * dt]
    )
    l_nodes = jax.vmap(op_fn)(t_nodes)
    l1 = jax.tree_util.tree_map(lambda a: a[0], l_nodes)
    l2 = jax.tree_util.tree_map(lambda a: a[1], l_nodes)
    w2 = split.scale_l(split.commutator(l1, l2), _B2 * dt * dt)
    w1 = split.scale_l(split.add_l(l1, l2), 0.5 * dt)
    return split.add_l(w1, w2), w1


def magnus6_step(op_fn, split: ExponentialSplit, t, x, dt, *,
                 adaptive: bool = True):
    """6th-order step: Yoshida triple-jump of the symmetric Magnus-4 step.

    xf = e^{Ω(t+ (1-g1)dt, g1 dt)} e^{Ω(t+g1 dt, (1-2g1)dt)} e^{Ω(t, g1 dt)} x
    err = e^{Ω(t, dt)} x - xf   (the plain order-4 step as the embedded
    lower-order comparison — the same samples economy as CFM: all 3 (+1)
    exponentials stack into ONE batched expm via exp_many).
    """
    from .. import lc
    from .protocol import index_u

    omegas = [
        _m4_omega(op_fn, split, t + o * dt, g * dt)[0]
        for o, g in zip(_SUB_OFF, _SUB_LEN)
    ]
    if adaptive:
        omegas.append(_m4_omega(op_fn, split, t, dt)[0])
    us = split.exp_many(omegas)
    xf = x
    for i in range(3):
        xf = split.map_exp(index_u(us, i), xf)
    if not adaptive:
        return xf, None
    err = lc.sub(split.map_exp(index_u(us, 3), x), xf)
    return xf, err


def magnus4_step(op_fn, split: ExponentialSplit, t, x, dt, *,
                 adaptive: bool = True):
    """4th-order Magnus with 2-node GL quadrature — magnus.rs:28-83.

    Ω  = (A1 + A2) dt/2 - (sqrt(3)/12) dt^2 [A1, A2]
    xf = e^{Ω} x0 ;  err = e^{Ω1} x0 - xf with Ω1 the order-2 part.

    TPU economy: with ``adaptive`` the order-4 and order-2 exponentials are
    ONE stacked batched expm (``exp_many``) instead of two dispatches; with
    ``adaptive=False`` (the ``no_adaptive`` economy the reference's Magnus
    lacks — it always computes both, magnus.rs:63-79) the order-2
    propagator is skipped entirely: one expm per step, err=None.
    """
    from .protocol import index_u

    omega, w1 = _m4_omega(op_fn, split, t, dt)

    if not adaptive:
        return split.map_exp(split.exp(omega), x), None

    u_pair = split.exp_many([omega, w1])
    xf = split.map_exp(index_u(u_pair, 0), x)
    from .. import lc

    err = lc.sub(split.map_exp(index_u(u_pair, 1), x), xf)
    return xf, err


@dataclasses.dataclass(frozen=True)
class ExpMidpoint:
    """Fixed-step exponential midpoint (MidpointExpLinearSolver,
    magnus.rs:85-148). Order 2, no error estimate."""

    split: ExponentialSplit
    op_fn: Callable = None  # set via make_step_fn argument instead if None

    nfev_per_step: int = 1

    def make_step_fn(self, op_fn=None):
        fn = op_fn if op_fn is not None else self.op_fn

        def step_fn(t, x, dt):
            return midpoint_step(fn, self.split, t, x, dt)

        return step_fn


@dataclasses.dataclass(frozen=True)
class Magnus4:
    """Adaptive Magnus-4 (MagnusExpLinearSolver, magnus.rs:151-285), with the
    error norm wired correctly (see module docstring).

    ``adaptive=False`` skips the order-2 comparison propagator entirely
    (one expm per step) — the fixed-step economy the reference never
    implemented for Magnus (its magnus_42 always computes both,
    magnus.rs:63-79)."""

    split: ExponentialSplit
    op_fn: Callable = None
    adaptive: bool = True

    nfev_per_step: int = 2

    def make_step_fn(self, op_fn=None):
        fn = op_fn if op_fn is not None else self.op_fn

        def step_fn(t, x, dt):
            return magnus4_step(fn, self.split, t, x, dt,
                                adaptive=self.adaptive)

        return step_fn


@dataclasses.dataclass(frozen=True)
class Magnus6:
    """Adaptive Magnus-6: Yoshida triple-jump composition of the symmetric
    Magnus-4 step, embedded against the plain Magnus-4 step over the full
    interval (err = x4 - x6). Order 6 at 3 exponentials/step (4 adaptive);
    the reference tops out at order 4."""

    split: ExponentialSplit
    op_fn: Callable = None
    adaptive: bool = True

    @property
    def nfev_per_step(self) -> int:
        # 3 sub-interval GL2 pairs + the full-interval pair when adaptive
        return 8 if self.adaptive else 6

    def make_step_fn(self, op_fn=None):
        fn = op_fn if op_fn is not None else self.op_fn

        def step_fn(t, x, dt):
            return magnus6_step(fn, self.split, t, x, dt,
                                adaptive=self.adaptive)

        return step_fn
