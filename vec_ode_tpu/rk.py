"""Explicit Runge-Kutta steppers over pytree states.

TPU-native counterpart of the reference's ``rk_step`` + ``RK45Solver``
(``/root/reference/src/base/rk.rs:90-155, 158-320``). The reference's hot loop
is 6 RHS evaluations + ~15 vector-length linear-combination passes per step
over abstract storage; here the stage loop is statically unrolled at trace
time, stage combinations are ``lc.lincomb`` expressions XLA fuses into a few
elementwise passes, and the RHS is an arbitrary JAX function (so for batched
linear ODEs the stage evaluations become MXU matmuls).

Reference semantics preserved exactly (SURVEY.md §2.3(2)):
  * With an embedded pair in adaptive mode, the step *advances the b_err
    (lower-order) solution* and the error estimate is err = x_b - x_berr
    (rk.rs:136-151) — classic Fehlberg without local extrapolation.
  * ``no_adaptive()`` (rk.rs:233-238) advances the b (higher-order) solution
    with no error estimate: pass ``embedded=False`` / ``adaptive=False``.
  * Zero entries of the tableau are skipped at trace time, mirroring nothing
    in the reference (it multiplies by zero) but producing identical math.

``advance_lower=False`` opts into local extrapolation (advance the b weights,
same error estimate) — an extension, not reference behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp

from . import lc
from .tableaus import RKF45, ButcherTableau

Pytree = Any


def rk_step(
    f: Callable,
    t,
    x0: Pytree,
    dt,
    tab: ButcherTableau,
    *,
    embedded: bool = True,
    advance_lower: bool = True,
) -> Tuple[Pytree, Optional[Pytree]]:
    """One explicit RK step. Returns (x_next, err) with err=None when the
    tableau has no embedded pair or ``embedded=False``.

    Mirrors ``rk_step`` (rk.rs:90-155): stages K_i = f(t + c_i dt,
    x0 + dt sum_j a_ij K_j), then x_b = x0 + dt sum b_i K_i and (embedded)
    x_berr = x0 + dt sum berr_i K_i, err = x_b - x_berr.
    """
    s = tab.stages
    K = [None] * s
    K[0] = f(t, x0)
    for i in range(1, s):
        ti = t + float(tab.c[i]) * dt
        idx = [j for j in range(i) if tab.a[i, j] != 0.0]
        if idx:
            incr = lc.lincomb([K[j] for j in idx],
                              [float(tab.a[i, j]) for j in idx])
            xi = lc.axpy(dt, incr, x0)
        else:
            xi = x0
        K[i] = f(ti, xi)

    def combo(w, base=None):
        idx = [j for j in range(s) if w[j] != 0.0]
        acc = lc.lincomb([K[j] for j in idx], [float(w[j]) for j in idx])
        if base is None:
            return lc.scale(acc, dt)
        return lc.axpy(dt, acc, base)

    x_b = combo(tab.b, x0)
    if not embedded or tab.b_err is None:
        return x_b, None

    # err = dt * sum (b_i - berr_i) K_i, computed DIRECTLY from the weight
    # difference rather than as x_b - x_berr (the reference's formulation,
    # rk.rs:136-151): mathematically identical, but free of the catastrophic
    # cancellation that floors the estimate at eps*|x| — essential for tight
    # rtol in f32 on TPU.
    err = combo(tab.b - tab.b_err)
    x_next = lc.sub(x_b, err) if advance_lower else x_b
    return x_next, err


@dataclasses.dataclass(frozen=True)
class RungeKutta:
    """Stepper factory for the driver. ``RungeKutta(RKF45)`` is the analog of
    ``RK45Solver`` (rk.rs:158-320); any :class:`ButcherTableau` works, as the
    reference's generic ``ButcherTableu::from_vecs`` (rk.rs:44-51) intended."""

    tableau: ButcherTableau = RKF45
    advance_lower: bool = True   # reference-compat: advance 4th-order solution
    embedded: bool = True

    # RHS signature is f(t, y) (vs op_fn(t) for exp steppers) — used by
    # ensemble_solve to thread per-trajectory params correctly
    takes_state = True

    @property
    def nfev_per_step(self) -> int:
        return self.tableau.stages

    def make_step_fn(self, f: Callable) -> Callable:
        def step_fn(t, x, dt):
            return rk_step(
                f, t, x, dt, self.tableau,
                embedded=self.embedded,
                advance_lower=self.advance_lower,
            )

        return step_fn
