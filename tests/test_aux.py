"""Auxiliary subsystems: quad, diff, resume/checkpointing, livelock guard."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

import vec_ode_tpu as vo
from vec_ode_tpu import diff, quad
from vec_ode_tpu.utils.checkpointing import load_state, save_state


# ------------------------------------------------------------------- quad --
def test_gauss_legendre_polynomial_exactness():
    # n-point GL is exact for polynomials up to degree 2n-1
    for n in range(1, 6):
        for deg in range(2 * n):
            got = quad.fixed_quad(
                lambda t, d=deg: t**d, 0.0, 1.0, n=n
            )
            np.testing.assert_allclose(
                float(got), 1.0 / (deg + 1), rtol=1e-12,
                err_msg=f"n={n} deg={deg}",
            )


def test_fixed_quad_pytree_and_interval():
    got = quad.fixed_quad(
        lambda t: {"a": jnp.sin(t), "b": jnp.asarray([t, t**2])},
        0.0, jnp.pi, n=5,
    )
    np.testing.assert_allclose(float(got["a"]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["b"]),
        [np.pi**2 / 2, np.pi**3 / 3], rtol=1e-9,
    )


def test_trapezoid():
    got = quad.trapezoid(lambda t: jnp.exp(t), 0.0, 1.0, n=512)
    np.testing.assert_allclose(float(got), np.e - 1.0, rtol=1e-5)


def test_averaged_operator_matches_integral():
    A0 = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float64)

    def op(t):
        return jnp.sin(t) * A0

    got = quad.averaged_operator(op, 0.0, jnp.pi, n=5)
    want = (1.0 - np.cos(np.pi)) / np.pi * np.asarray(A0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


# ------------------------------------------------------------------- diff --
def test_grad_terminal_matches_fd():
    from vec_ode_tpu.rk import rk_step

    y0 = jnp.asarray([1.0, 0.0], jnp.float64)

    def factory(theta):
        A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float64) * theta

        def step_fn(t, x, dt):
            return rk_step(lambda tt, y: A @ y, t, x, dt, vo.RKF45)

        return step_fn

    g = diff.grad_terminal(
        lambda yf: yf[0], factory, y0, 0.0, 1.0, 0.05,
        ctl=vo.StepControl(max_steps=32),
    )(0.7)
    eps = 1e-6

    def val(th):
        sol = diff.solve_for_grad(
            factory, th, y0, 0.0, 1.0, 0.05, ctl=vo.StepControl(max_steps=32)
        )
        return float(sol.y_final[0])

    fd = (val(0.7 + eps) - val(0.7 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-6)


def test_grad_with_remat():
    from vec_ode_tpu.rk import rk_step

    def factory(theta):
        def step_fn(t, x, dt):
            return rk_step(lambda tt, y: -theta * y, t, x, dt, vo.RKF45)

        return step_fn

    g = diff.grad_terminal(
        lambda yf: yf, factory, jnp.asarray(1.0, jnp.float64),
        0.0, 1.0, 0.05, ctl=vo.StepControl(max_steps=32), remat=True,
    )(1.3)
    # d/dθ e^{-θ} = -e^{-θ}
    np.testing.assert_allclose(float(g), -np.exp(-1.3), rtol=1e-6)


# -------------------------------------------------------- resume/checkpoint --
def test_resume_matches_uninterrupted(tmp_path):
    from vec_ode_tpu.rk import rk_step

    def step_fn(t, x, dt):
        return rk_step(lambda tt, y: -y, t, x, dt, vo.RKF45)

    t_grid = vo.make_grid(0.0, 2.0, dtype=jnp.float64)
    ctl = vo.StepControl(rtol=1e-8)

    full = vo.integrate(step_fn, jnp.asarray(1.0, jnp.float64), t_grid, 1e-2,
                        adaptive=True, ctl=ctl)

    # run 10 iterations, checkpoint to disk, restore, resume
    state = vo.init_state(jnp.asarray(1.0, jnp.float64), t_grid, 1e-2)
    step = jax.jit(functools.partial(
        vo.step_once, step_fn=step_fn, adaptive=True, ctl=ctl))
    for _ in range(10):
        state = step(state)
    save_state(tmp_path / "ckpt", state)
    restored = load_state(tmp_path / "ckpt", like=state)
    sol = vo.resume(restored, step_fn, adaptive=True, ctl=ctl)
    assert bool(sol.success)
    np.testing.assert_allclose(
        float(sol.y_final), float(full.y_final), rtol=1e-14
    )
    assert int(sol.n_accept) == int(full.n_accept)


# ------------------------------------------------------------ livelock guard --
def test_reject_streak_surfaces_stall():
    from vec_ode_tpu.rk import rk_step

    # oscillator with enormous frequency: at max_dt-capped steps the error
    # stays >> rtol while min_dt floors h -> reference-style livelock
    A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float64) * 1e8

    def step_fn(t, x, dt):
        return rk_step(lambda tt, y: A @ y, t, x, dt, vo.RKF45)

    t_grid = vo.make_grid(0.0, 1.0, dtype=jnp.float64)
    ctl = vo.StepControl(rtol=1e-10, min_dt=1e-4, max_dt=1.0,
                         max_reject_streak=25, max_steps=10_000)
    sol = vo.integrate(step_fn, jnp.asarray([1.0, 0.0], jnp.float64),
                       t_grid, 1e-2, adaptive=True, ctl=ctl)
    assert int(sol.status) == vo.ERR_STALLED
    assert int(sol.n_iters) < 100  # detected quickly, not at max_steps


def test_reference_mode_livelocks_silently():
    from vec_ode_tpu.rk import rk_step

    A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float64) * 1e8

    def step_fn(t, x, dt):
        return rk_step(lambda tt, y: A @ y, t, x, dt, vo.RKF45)

    t_grid = vo.make_grid(0.0, 1.0, dtype=jnp.float64)
    ctl = vo.StepControl(rtol=1e-10, min_dt=1e-4, max_dt=1.0,
                         max_steps=500)  # max_reject_streak=0 (reference)
    sol = vo.integrate(step_fn, jnp.asarray([1.0, 0.0], jnp.float64),
                       t_grid, 1e-2, adaptive=True, ctl=ctl)
    assert int(sol.status) == vo.ERR_MAX_STEPS


def test_checkpoint_names_do_not_collide(tmp_path):
    """Regression: dotted checkpoint names ('ckpt.step100' vs
    'ckpt.step200') must save to distinct npz files (with_suffix used to
    collapse both onto ckpt.npz, silently destroying the first)."""
    from vec_ode_tpu.utils.checkpointing import _npz_path

    a = _npz_path(tmp_path / "ckpt.step100")
    b = _npz_path(tmp_path / "ckpt.step200")
    assert a != b
    assert a.name == "ckpt.step100.npz" and b.name == "ckpt.step200.npz"
    assert _npz_path(tmp_path / "plain.npz").name == "plain.npz"
