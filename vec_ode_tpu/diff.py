"""Differentiable integration.

The reference publicly declares an autodiff module and ships it empty
(``/root/reference/src/diff/mod.rs`` = 0 lines, declared at lib.rs:12). The
JAX rebuild realizes it: solutions are differentiable end-to-end.

Two regimes:
  * ``method="scan"`` integration (driver.py) is reverse-mode differentiable
    out of the box — :func:`grad_terminal` / :func:`value_and_grad_terminal`
    wrap the common "gradient of a terminal-state loss w.r.t. parameters"
    case, with optional rematerialization (``jax.checkpoint``) so memory
    stays O(sqrt(steps)) instead of O(steps).
  * forward sensitivities of matrix exponentials via
    :func:`~vec_ode_tpu.ops.expm.expm_frechet`; ``expm`` itself carries an
    exact Fréchet-adjoint VJP, so exponential integrators are reverse-mode
    differentiable too.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

from .controller import StepControl
from .driver import Solution, integrate, make_grid

Pytree = Any


def solve_for_grad(
    step_fn_factory: Callable,
    params: Pytree,
    y0: Pytree,
    t0,
    tf,
    h0,
    *,
    adaptive: bool = False,
    ctl: StepControl = StepControl(max_steps=4096),
    remat: bool = False,
    **kw,
) -> Solution:
    """Differentiable solve: ``step_fn_factory(params) -> step_fn``; the
    returned Solution is a pytree whose leaves carry gradients w.r.t.
    ``params`` and ``y0``.

    Uses the bounded-scan driver; ``ctl.max_steps`` is the scan length — pick
    it tight, every iteration costs a stepper evaluation. ``remat=True``
    wraps the loop body in ``jax.checkpoint`` (recompute instead of storing
    per-step residuals — the TPU-native answer to deep integration graphs).
    """
    import jax.numpy as jnp

    step_fn = step_fn_factory(params)
    if remat:
        inner = step_fn
        step_fn = jax.checkpoint(lambda t, x, dt: inner(t, x, dt))
    t_grid = make_grid(t0, tf, dtype=jnp.result_type(
        jnp.asarray(t0), jnp.asarray(tf), float))
    return integrate(
        step_fn, y0, t_grid, h0,
        adaptive=adaptive, ctl=ctl, method="scan", **kw,
    )


def grad_terminal(
    loss_fn: Callable,
    step_fn_factory: Callable,
    y0: Pytree,
    t0,
    tf,
    h0,
    **kw,
) -> Callable:
    """Returns ``grad(params)``: the gradient of ``loss_fn(y_final)`` w.r.t.
    stepper parameters, through the full integration."""

    def objective(params):
        sol = solve_for_grad(step_fn_factory, params, y0, t0, tf, h0, **kw)
        return loss_fn(sol.y_final)

    return jax.grad(objective)


def value_and_grad_terminal(loss_fn, step_fn_factory, y0, t0, tf, h0, **kw):
    def objective(params):
        sol = solve_for_grad(step_fn_factory, params, y0, t0, tf, h0, **kw)
        return loss_fn(sol.y_final)

    return jax.value_and_grad(objective)
