"""High-level solve API.

The reference exposes solvers as stateful structs driven by a user loop
(``while let ODEState::Ok(_) = solver.step()``, impls/nalgebra.rs:61-64). Here
the equivalent surface is a single pure function per problem class that jits,
vmaps and shards:

  * :func:`solve_ivp` — nonlinear dx/dt = f(t, x)        (RK steppers)
  * exp-solver entry points live in :mod:`vec_ode_tpu.exp`

Builder semantics (``with_tolerance`` / ``with_step_range`` / ``with_init_step``,
ode.rs:267-306) map onto :class:`~vec_ode_tpu.controller.StepControl` fields
plus the ``h0`` argument (default sqrt(min_dt*max_dt), matching
``with_step_range``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp

from . import lc
from .controller import StepControl
from .driver import Solution, integrate, make_grid
from .rk import RungeKutta

Pytree = Any


def _is_backward(t0, tf) -> bool:
    """True iff tf < t0, for python scalars AND concrete arrays. Traced
    endpoints cannot be inspected: integration direction must be static, so
    we assume forward (the driver's ERR_BAD_GRID guard catches misuse at
    runtime instead of hanging)."""
    import numpy as np

    try:
        return bool(np.asarray(tf) < np.asarray(t0))
    except Exception:
        return False


def solve_ivp(
    f: Callable,
    t0,
    tf,
    y0: Pytree,
    *,
    stepper: RungeKutta | Any = None,
    h0: Optional[float] = None,
    adaptive: bool = True,
    ctl: StepControl = StepControl(),
    save_at=None,
    error_norm: Callable = lc.norm_l2,
    time_dtype=None,
    method: str = "while",
    events=None,
    remat_levels: int = 0,
    grad_safe: bool = False,
) -> Solution:
    """Integrate dx/dt = f(t, y) from t0 to tf.

    ``remat_levels`` / ``grad_safe`` (``method="scan"`` gradients): nested-
    remat checkpointing and overflow-safe reject handling — see
    :func:`~vec_ode_tpu.driver.resume` and :mod:`vec_ode_tpu.diff`.

    ``f(t, y) -> dy/dt`` over an arbitrary pytree state. ``stepper`` defaults
    to Fehlberg RKF45 (the reference's ``RK45Solver``, rk.rs:158-320).
    ``save_at`` holds interior output times; the driver lands on them exactly
    (the reference's t_list/Chkpt mechanism, ode.rs:165-176).

    ``events``: an :class:`~vec_ode_tpu.events.Event` (or bare callable
    ``g(t, y) -> scalar``), a sequence of them, or an ``EventConfig`` — the
    driver locates the first sign change of each g (see events.py) and
    reports it in ``Solution.event_t``/``event_found``/``event_y``;
    ``Event(terminal=True)`` ends the solve there (status ``DONE_EVENT``),
    ``terminal=n`` at the n-th crossing. ``EventConfig(max_crossings=K)``
    locates the first K crossings per event (``Solution.event_t_k``) and
    counts every further one (``Solution.event_count``).

    Backward integration (tf < t0, unsupported by the reference) works via
    time reversal: integrate s in [0, t0-tf] with g(s, y) = -f(t0-s, y); the
    reported ts/t_final are mapped back to user time.
    """
    from .events import as_event_config

    if stepper is None:
        stepper = RungeKutta()
    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    event_cfg = as_event_config(events)
    backward = _is_backward(t0, tf)
    if backward:
        if event_cfg is not None:
            event_cfg = _reverse_events(event_cfg, float(t0))
        f, t0, tf, save_at, t0_orig = _reverse_setup(
            f, t0, tf, save_at,
            lambda fn, t0o: (lambda s, y: lc.scale(fn(t0o - s, y), -1.0)),
        )
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    h0 = _check_h0(h0, ctl, adaptive)
    step_fn = stepper.make_step_fn(f)
    init_carry_fn = (
        stepper.make_init_carry(f)
        if getattr(stepper, "has_carry", False) else None
    )
    sol = integrate(
        step_fn,
        y0,
        t_grid,
        h0,
        adaptive=adaptive,
        ctl=ctl,
        error_norm=error_norm,
        method=method,
        pack_carry=getattr(stepper, "prefers_packed_carry", False),
        init_carry_fn=init_carry_fn,
        event_cfg=event_cfg,
        remat_levels=remat_levels,
        grad_safe=grad_safe,
    )
    sol = _attach_nfev(sol, stepper)
    if backward:
        sol = _reverse_result(sol, t0_orig)
    return sol


def _reverse_setup(fn, t0, tf, save_at, negate):
    """Time-reversal transform for backward integration (tf < t0):
    integrate s in [0, t0-tf] with the negated, time-mirrored callable.
    Returns (fn', t0', tf', save_at', t0_orig)."""
    t0_orig = float(t0)
    fn2 = negate(fn, t0_orig)
    if save_at is not None:
        save_at = t0_orig - jnp.asarray(save_at)[::-1]
    return fn2, 0.0, t0_orig - float(tf), save_at, t0_orig


def _reverse_result(sol: Solution, t0_orig) -> Solution:
    """Map a time-reversed Solution back to user time (ts/ys flipped,
    t_final and event times remapped)."""
    import dataclasses as dc

    import jax

    ev_kw = {}
    if sol.event_t is not None:
        # never-found events hold +inf; map to -inf in user time so the
        # "not found" sentinel stays on the unreachable side
        ev_kw["event_t"] = jnp.where(
            sol.event_found, t0_orig - sol.event_t, -jnp.inf
        )
    if sol.event_t_k is not None:
        # slot s remains the (s+1)-th crossing ALONG THE INTEGRATION
        # DIRECTION (here: going backward from t0); unreached slots hold
        # +inf in reversed time -> -inf in user time
        ev_kw["event_t_k"] = jnp.where(
            jnp.isfinite(sol.event_t_k), t0_orig - sol.event_t_k, -jnp.inf
        )
    return dc.replace(
        sol,
        ts=(t0_orig - sol.ts)[::-1],
        ys=jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=0), sol.ys),
        t_final=t0_orig - sol.t_final,
        **ev_kw,
    )


def _reverse_events(cfg, t0_orig: float):
    """Time-mirror event functions for the backward-integration transform:
    g'(s, y) = g(t0 - s, y)."""
    import dataclasses as dc

    from .events import Event

    evs = tuple(
        dc.replace(
            e,
            fn=(lambda s, y, _f=e.fn: _f(t0_orig - s, y)),
            # a rising crossing in user time is falling in reversed time
            direction=-e.direction,
        )
        for e in cfg.events
    )
    return dc.replace(cfg, events=evs)


def _check_h0(h0, ctl: StepControl, adaptive: bool):
    """Shared with the ensemble path — see controller.check_h0."""
    from .controller import check_h0

    return check_h0(h0, ctl, adaptive)


def _attach_nfev(sol: Solution, stepper) -> Solution:
    """RHS-evaluation counter: iterations x stage evaluations per attempt
    (the per-step cost is static, SURVEY §3.1), plus any one-time carry
    seeding (FSAL steppers pay 1 eval for the initial slope and s-1 per
    attempt thereafter)."""
    import dataclasses as dc

    n = getattr(stepper, "nfev_per_step", None)
    if n is None:
        return sol
    n0 = int(getattr(stepper, "nfev_init", 0))
    return dc.replace(
        sol, n_rhs_evals=n0 + (sol.n_accept + sol.n_reject) * int(n)
    )


def solve_linear(
    op_fn: Callable,
    t0,
    tf,
    y0: Pytree,
    *,
    stepper,
    h0: Optional[float] = None,
    adaptive: bool = False,
    ctl: StepControl = StepControl(),
    save_at=None,
    error_norm: Callable = lc.norm_l2,
    time_dtype=None,
    method: str = "while",
    events=None,
) -> Solution:
    """Integrate the linear system dx/dt = A(t) x with an exponential stepper.

    ``op_fn(t) -> L`` assembles the operator at scalar time t (the reference's
    Fun callbacks, magnus.rs:12/32, cfm.rs:54 — multi-sample solvers vmap it).
    ``stepper`` is an exp stepper (ExpMidpoint / Magnus4 / CFM... from
    :mod:`vec_ode_tpu.exp`) or a split solver (SplitMidpoint / SplitCFM, whose
    ``op_fn(t)`` returns the (La, Lb) pair).

    Backward integration (tf < t0) works via time reversal of the operator:
    B(s) = -A(t0 - s).
    """
    from .events import as_event_config

    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    event_cfg = as_event_config(events)
    backward = _is_backward(t0, tf)
    if backward:
        if event_cfg is not None:
            event_cfg = _reverse_events(event_cfg, float(t0))
        op_fn, t0, tf, save_at, t0_orig = _reverse_setup(
            op_fn, t0, tf, save_at,
            lambda fn, t0o: (lambda s: lc.scale(fn(t0o - s), -1.0)),
        )
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    h0 = _check_h0(h0, ctl, adaptive)
    step_fn = stepper.make_step_fn(op_fn)
    init_carry_fn = (
        stepper.make_init_carry(op_fn)
        if getattr(stepper, "has_carry", False) else None
    )
    sol = integrate(
        step_fn,
        y0,
        t_grid,
        h0,
        adaptive=adaptive,
        ctl=ctl,
        error_norm=error_norm,
        method=method,
        pack_carry=getattr(stepper, "prefers_packed_carry", False),
        init_carry_fn=init_carry_fn,
        event_cfg=event_cfg,
    )
    sol = _attach_nfev(sol, stepper)
    if backward:
        sol = _reverse_result(sol, t0_orig)
    return sol
