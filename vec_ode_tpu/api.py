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
) -> Solution:
    """Integrate dx/dt = f(t, y) from t0 to tf.

    ``f(t, y) -> dy/dt`` over an arbitrary pytree state. ``stepper`` defaults
    to Fehlberg RKF45 (the reference's ``RK45Solver``, rk.rs:158-320).
    ``save_at`` holds interior output times; the driver lands on them exactly
    (the reference's t_list/Chkpt mechanism, ode.rs:165-176).
    """
    if stepper is None:
        stepper = RungeKutta()
    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    if h0 is None:
        h0 = ctl.init_h()
    step_fn = stepper.make_step_fn(f)
    return integrate(
        step_fn,
        y0,
        t_grid,
        h0,
        adaptive=adaptive,
        ctl=ctl,
        error_norm=error_norm,
        method=method,
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
) -> Solution:
    """Integrate the linear system dx/dt = A(t) x with an exponential stepper.

    ``op_fn(t) -> L`` assembles the operator at scalar time t (the reference's
    Fun callbacks, magnus.rs:12/32, cfm.rs:54 — multi-sample solvers vmap it).
    ``stepper`` is an exp stepper (ExpMidpoint / Magnus4 / CFM... from
    :mod:`vec_ode_tpu.exp`) or a split solver (SplitMidpoint / SplitCFM, whose
    ``op_fn(t)`` returns the (La, Lb) pair).
    """
    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    if h0 is None:
        h0 = ctl.init_h()
    step_fn = stepper.make_step_fn(op_fn)
    return integrate(
        step_fn,
        y0,
        t_grid,
        h0,
        adaptive=adaptive,
        ctl=ctl,
        error_norm=error_norm,
        method=method,
    )
