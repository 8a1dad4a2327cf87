"""Dense output: interpolated saves without grid-hitting.

The reference has **no dense output / interpolation** (SURVEY §2.3(5)): its
only output mechanism is truncating steps to land exactly on t_list times,
which perturbs the step-size sequence around every save point. This module
adds the modern alternative: the controller runs free (steps are never
truncated except at tf) and crossed save times are filled by cubic Hermite
interpolation from (x, f(t,x)) at both step ends — local accuracy O(h^4),
matching the advanced RKF45 solution's order.

Design: a separate driver body rather than more flags in
:func:`~vec_ode_tpu.driver.step_once`, so the reference-parity path stays
exact. Dense steppers return ``(x_next, err, f0, f1)`` where f0 = f(t, x)
and f1 = f(t+dt, x_next) (one extra RHS evaluation per accepted step; for
FSAL tableaus like DOPRI5 the last stage already is f1 — optimization left
for the stepper).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from . import lc
from .controller import StepControl, controller_update, end_tolerance, error_measure
from .driver import (
    DONE,
    ERR_MAX_STEPS,
    RUNNING,
    IntState,
    Solution,
    init_state,
)

Pytree = Any


def hermite_cubic(x0: Pytree, x1: Pytree, f0: Pytree, f1: Pytree, dt, theta):
    """Cubic Hermite interpolant on [0, 1] with endpoint values/slopes."""
    th = theta
    h00 = 2 * th**3 - 3 * th**2 + 1
    h10 = th**3 - 2 * th**2 + th
    h01 = -2 * th**3 + 3 * th**2
    h11 = th**3 - th**2

    def leaf(a, b, fa, fb):
        hdt = lc._match_scalar(dt, a)
        return (
            lc._match_scalar(h00, a) * a
            + lc._match_scalar(h10, a) * hdt * fa
            + lc._match_scalar(h01, a) * b
            + lc._match_scalar(h11, a) * hdt * fb
        )

    return jax.tree_util.tree_map(leaf, x0, x1, f0, f1)


def _dense_step(
    state: IntState,
    step_fn_dense: Callable,
    *,
    adaptive: bool,
    ctl: StepControl,
    error_norm: Callable,
) -> IntState:
    """One free-running iteration: only tf truncates dt; crossed interior
    save times are recorded via Hermite interpolation."""
    t_grid = state.ts_grid
    n_grid = t_grid.shape[0]
    running = state.status == RUNNING

    tf = t_grid[-1]
    rem = tf - state.t
    at_end = jnp.abs(rem) <= end_tolerance(tf)
    stepping = running & ~at_end
    # dt=0 on masked lanes keeps discarded evaluations finite (grad-safe)
    dt = jnp.where(stepping, jnp.minimum(state.h, rem), 0.0)

    x_next, err, f0, f1 = step_fn_dense(state.t, state.x, dt)

    if adaptive:
        if err is None:
            raise ValueError("adaptive integration requires an error estimate")
        measure = error_measure(error_norm, state.x, x_next, err, ctl)
        new_h, accept = controller_update(
            state.h, measure, ctl, prev_err_norm=state.err_norm,
            prev_rejected=state.reject_streak > 0,
        )
    else:
        measure = state.err_norm
        new_h, accept = state.h, jnp.asarray(True)

    do_advance = stepping & accept
    do_reject = stepping & ~accept
    t_new = state.t + dt

    # record every save time crossed by this accepted step (vectorized over
    # the whole grid; n_grid is small). Index 0 (t0) records the initial
    # state; index n_grid-1 (tf) is landed on exactly.
    tol = end_tolerance(t_grid)
    crossed = (
        do_advance
        & (t_grid > state.t + tol)
        & (t_grid <= t_new + tol)
    )                                           # (n_grid,)
    crossed = crossed | (
        (jnp.arange(n_grid) == 0) & (state.n_iters == 0) & running
    )
    theta = jnp.clip(
        (t_grid - state.t) / jnp.maximum(dt, jnp.finfo(dt.dtype).tiny),
        0.0, 1.0,
    )

    def record(buf, a, b, fa, fb):
        # buf: (n_grid, ...) ; interpolate at all grid times (one
        # hermite_cubic over the broadcast grid axis), select crossed
        th = theta.reshape((n_grid,) + (1,) * (buf.ndim - 1)).astype(
            jnp.finfo(buf.dtype).dtype if jnp.issubdtype(
                buf.dtype, jnp.inexact) else jnp.float32
        )
        interp = hermite_cubic(a[None], b[None], fa[None], fb[None], dt, th)
        m = crossed.reshape((n_grid,) + (1,) * (buf.ndim - 1))
        return jnp.where(m, interp, buf)

    ys = jax.tree_util.tree_map(
        record, state.ys, state.x, x_next, f0, f1
    )

    t = jnp.where(do_advance, t_new, state.t)
    x = lc.tree_where(do_advance, x_next, state.x)
    prev_h = jnp.where(stepping & jnp.asarray(adaptive), state.h,
                       state.prev_h)
    h = jnp.where(stepping & jnp.asarray(adaptive), new_h, state.h)
    tgt_idx = jnp.sum(
        (t_grid <= t + end_tolerance(t_grid)), axis=0
    ).astype(jnp.int32)

    status = jnp.where(running & at_end, DONE, state.status)
    n_iters = state.n_iters + jnp.where(running, 1, 0).astype(jnp.int32)
    status = jnp.where(
        (status == RUNNING) & (n_iters >= ctl.max_steps), ERR_MAX_STEPS,
        status,
    )
    streak = jnp.where(
        do_reject, state.reject_streak + 1,
        jnp.where(do_advance, 0, state.reject_streak),
    ).astype(jnp.int32)
    if ctl.max_reject_streak > 0:
        from .driver import ERR_STALLED

        status = jnp.where(
            (status == RUNNING) & (streak >= ctl.max_reject_streak),
            ERR_STALLED, status,
        )

    return state._replace(
        t=t, x=x, h=h, prev_h=prev_h, tgt_idx=tgt_idx, status=status,
        err_norm=jnp.where(stepping, jnp.asarray(measure,
                                                 state.err_norm.dtype),
                           state.err_norm),
        n_accept=state.n_accept + do_advance.astype(jnp.int32),
        n_reject=state.n_reject + do_reject.astype(jnp.int32),
        n_iters=n_iters, reject_streak=streak, ys=ys,
    )


def integrate_interp(
    step_fn_dense: Callable,
    x0: Pytree,
    t_grid: jax.Array,
    h0,
    *,
    adaptive: bool = True,
    ctl: StepControl = StepControl(),
    error_norm: Callable = lc.norm_l2,
) -> Solution:
    """Free-running integration with interpolated saves at ``t_grid``.

    Unlike :func:`~vec_ode_tpu.driver.integrate` ("hit" semantics), save
    times never perturb the step sequence: the controller's h evolution is
    identical to a run with no save points at all. At the final grid time
    the last recorded value is the interpolant of the step that crossed it;
    tf itself is still landed on exactly so ``y_final`` is non-interpolated.
    """
    state = init_state(x0, t_grid, h0)
    body = partial(
        _dense_step, step_fn_dense=step_fn_dense, adaptive=adaptive,
        ctl=ctl, error_norm=error_norm,
    )

    final = jax.lax.while_loop(
        lambda s: jnp.any(s.status == RUNNING), body, state
    )
    # tf is landed on exactly -> overwrite the last slot with the true state
    ys = jax.tree_util.tree_map(
        lambda buf, leaf: buf.at[-1].set(leaf), final.ys, final.x
    )
    return Solution(
        ts=final.ts_grid,
        ys=ys,
        t_final=final.t,
        y_final=final.x,
        status=final.status,
        n_accept=final.n_accept,
        n_reject=final.n_reject,
        n_iters=final.n_iters,
        h_final=final.h,
    )


def solve_ivp_dense(
    f: Callable,
    t0,
    tf,
    y0: Pytree,
    *,
    tableau=None,
    h0=None,
    adaptive: bool = True,
    ctl: StepControl = StepControl(),
    save_at=None,
    error_norm: Callable = lc.norm_l2,
    time_dtype=None,
) -> Solution:
    """solve_ivp with interpolated (non-perturbing) saves.

    One extra RHS evaluation per attempted step provides the right-endpoint
    slope for the cubic Hermite interpolant.
    """
    from .driver import make_grid
    from .rk import rk_step
    from .tableaus import RKF45

    if tableau is None:
        tableau = RKF45
    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    if h0 is None:
        h0 = ctl.init_h()

    def step_fn_dense(t, x, dt):
        x_next, err = rk_step(f, t, x, dt, tableau)
        f0 = f(t, x)          # == K[0]; XLA CSEs the duplicate evaluation
        f1 = f(t + dt, x_next)
        return x_next, err, f0, f1

    return integrate_interp(
        step_fn_dense, y0, t_grid, h0,
        adaptive=adaptive, ctl=ctl, error_norm=error_norm,
    )


def solve_linear_dense(
    op_fn: Callable,
    t0,
    tf,
    y0: Pytree,
    *,
    stepper,
    h0=None,
    adaptive: bool = False,
    ctl: StepControl = StepControl(),
    save_at=None,
    error_norm: Callable = lc.norm_l2,
    time_dtype=None,
) -> Solution:
    """solve_linear with interpolated saves: the Hermite endpoint slopes are
    the operator action dx/dt = A(t) x via the split's ``apply_l``.

    ``stepper`` is an exp stepper carrying its split (ExpMidpoint / Magnus4 /
    CFM...) or a split-pair solver (SplitMidpoint, whose op_fn yields
    (La, Lb))."""
    import jax.numpy as jnp

    from .driver import make_grid

    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    if h0 is None:
        h0 = ctl.init_h()

    if hasattr(stepper, "split") and stepper.split is not None:
        split = stepper.split

        def slope(t, x):
            return split.apply_l(op_fn(t), x)
    elif hasattr(stepper, "sp_a"):
        from .exp.splits import _Pair

        pair = _Pair(stepper.sp_a, stepper.sp_b)

        def slope(t, x):
            return pair.apply_l(op_fn(t), x)
    else:
        raise ValueError(
            "stepper must carry its split(s) for dense output slopes"
        )

    inner = stepper.make_step_fn(op_fn)

    def step_fn_dense(t, x, dt):
        x_next, err = inner(t, x, dt)
        return x_next, err, slope(t, x), slope(t + dt, x_next)

    return integrate_interp(
        step_fn_dense, y0, t_grid, h0,
        adaptive=adaptive, ctl=ctl, error_norm=error_norm,
    )
