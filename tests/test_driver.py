import functools

import jax
import jax.numpy as jnp
import numpy as np

import vec_ode_tpu as vo
from vec_ode_tpu import lc
from vec_ode_tpu.driver import EVT_CHKPT, EVT_END, EVT_REJECT, EVT_STEP


def decay_step(t, x, dt):
    from vec_ode_tpu.rk import rk_step

    return rk_step(lambda t, y: -y, t, x, dt, vo.RKF45)


def run_events(t_grid, h0, ctl, adaptive=True, n_max=200):
    """Step-by-step view of the driver: the reference's user-loop pattern
    (impls/nalgebra.rs:61-64) with per-iteration event inspection."""
    state = vo.init_state(jnp.asarray(1.0, jnp.float64), t_grid, h0)
    step = jax.jit(
        functools.partial(
            vo.step_once, step_fn=decay_step, adaptive=adaptive, ctl=ctl
        )
    )
    events = []
    for _ in range(n_max):
        state = step(state)
        events.append(int(state.last_event))
        if int(state.status) != vo.RUNNING:
            break
    return state, events


def test_event_sequence_fixed():
    # grid [0, 1], h=0.5: Chkpt@t0, Step, Step, End  (ode.rs step_size_of)
    t_grid = vo.make_grid(0.0, 1.0, dtype=jnp.float64)
    state, events = run_events(t_grid, 0.5, vo.StepControl(), adaptive=False)
    assert events == [EVT_CHKPT, EVT_STEP, EVT_STEP, EVT_END]
    assert int(state.status) == vo.DONE
    np.testing.assert_allclose(float(state.t), 1.0, atol=1e-14)


def test_truncation_and_prev_h_restoration():
    # grid [0, 0.75, 1.5], h=0.5: the step at t=0.5 truncates to 0.25 to hit
    # 0.75, then checkpoint restores h from prev_h (ode.rs:192-195)
    t_grid = vo.make_grid(0.0, 1.5, save_at=jnp.asarray([0.75]),
                          dtype=jnp.float64)
    state, events = run_events(t_grid, 0.5, vo.StepControl(), adaptive=False)
    assert events == [
        EVT_CHKPT,            # t0 checkpoint
        EVT_STEP, EVT_STEP,   # 0->0.5->0.75 (second step truncated to 0.25)
        EVT_CHKPT,            # hit 0.75
        EVT_STEP, EVT_STEP,   # 0.75->1.25->1.5 (truncated 0.25)
        EVT_END,
    ]
    np.testing.assert_allclose(float(state.h), 0.5, atol=1e-15)


def test_adaptive_reject_then_accept():
    # enormous first h must be rejected, shrunk by 0.3x repeatedly, then accepted
    t_grid = vo.make_grid(0.0, 1.0, dtype=jnp.float64)
    ctl = vo.StepControl(rtol=1e-8, max_dt=1.0)
    state, events = run_events(t_grid, 1.0, ctl, adaptive=True)
    assert events[0] == EVT_CHKPT
    assert events[1] == EVT_REJECT
    assert EVT_STEP in events
    assert int(state.status) == vo.DONE
    assert int(state.n_reject) >= 1
    # controller shrinks by exactly min_factor=0.3 when far over tolerance
    # (ode.rs:321-323)


def test_adaptive_h_growth_capped_at_2x():
    t_grid = vo.make_grid(0.0, 10.0, dtype=jnp.float64)
    ctl = vo.StepControl(rtol=1e-3, max_dt=10.0)
    state = vo.init_state(jnp.asarray(1.0, jnp.float64), t_grid, 1e-4)
    step = jax.jit(
        functools.partial(
            vo.step_once, step_fn=decay_step, adaptive=True, ctl=ctl
        )
    )
    hs = []
    for _ in range(6):
        state = step(state)
        hs.append(float(state.h))
    # after the t0 checkpoint, each accepted step may grow h by <= 2.0x
    for h_prev, h_next in zip(hs[1:], hs[2:]):
        assert h_next <= 2.0 * h_prev + 1e-15


def test_vmap_integrate_matches_single():
    # batched integrate == stacked single-trajectory results
    def make_solution(y0):
        t_grid = vo.make_grid(0.0, 1.0, dtype=jnp.float64)
        return vo.integrate(
            decay_step, y0, t_grid, 0.01,
            adaptive=True, ctl=vo.StepControl(rtol=1e-8),
        )

    y0s = jnp.asarray([1.0, 2.0, -0.5, 3.3], jnp.float64)
    batched = jax.jit(jax.vmap(make_solution))(y0s)
    for i, y0 in enumerate(np.asarray(y0s)):
        single = make_solution(jnp.asarray(y0))
        np.testing.assert_allclose(
            float(batched.y_final[i]), float(single.y_final), rtol=1e-12
        )
        assert int(batched.n_accept[i]) == int(single.n_accept)
        assert int(batched.status[i]) == vo.DONE


def test_vmap_heterogeneous_step_counts():
    # different decay rates -> different per-trajectory step counts; all finish
    def make_solution(rate):
        def step(t, x, dt):
            from vec_ode_tpu.rk import rk_step

            return rk_step(lambda t, y: rate * y, t, x, dt, vo.RKF45)

        t_grid = vo.make_grid(0.0, 1.0, dtype=jnp.float64)
        return vo.integrate(
            step, jnp.asarray(1.0, jnp.float64), t_grid, 0.01,
            adaptive=True, ctl=vo.StepControl(rtol=1e-8),
        )

    rates = jnp.asarray([-0.1, -1.0, -10.0, -100.0], jnp.float64)
    sols = jax.jit(jax.vmap(make_solution))(rates)
    assert all(int(s) == vo.DONE for s in sols.status)
    # absolute tolerance: the reference controller accepts on the absolute
    # error norm, so tiny solutions carry ~n_steps*rtol absolute error
    np.testing.assert_allclose(
        np.asarray(sols.y_final), np.exp(np.asarray(rates)), atol=2e-6
    )
    counts = [int(c) for c in sols.n_accept]
    assert counts[3] > counts[0]  # stiffer -> more steps


def test_backward_with_array_endpoints():
    # concrete jnp scalars (not python floats) must still trigger reversal
    sol = vo.solve_ivp(
        lambda t, y: -y, jnp.asarray(2.0), jnp.asarray(0.0),
        jnp.asarray(float(np.exp(-2.0)), jnp.float64),
        ctl=vo.StepControl(rtol=1e-9, min_dt=1e-8),
    )
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.y_final), 1.0, rtol=1e-6)


def test_traced_backward_surfaces_bad_grid():
    # direction cannot be known under jit -> the driver flags ERR_BAD_GRID
    # instead of burning max_steps on rejected negative trial steps
    from vec_ode_tpu.driver import ERR_BAD_GRID

    @jax.jit
    def run(t0, tf):
        return vo.solve_ivp(
            lambda t, y: -y, t0, tf, jnp.asarray(1.0, jnp.float64),
            ctl=vo.StepControl(rtol=1e-8, max_steps=5000),
        )

    sol = run(jnp.asarray(1.0, jnp.float64), jnp.asarray(0.0, jnp.float64))
    assert int(sol.status) == ERR_BAD_GRID
    assert int(sol.n_iters) < 5  # detected immediately, not at max_steps


def test_scan_grad_not_poisoned_after_done():
    # adaptive scan solve with far more iterations than needed: post-DONE
    # lanes step with dt=0, so reverse-mode stays finite
    from vec_ode_tpu import diff

    def factory(theta):
        from vec_ode_tpu.rk import rk_step

        def sf(t, x, dt):
            return rk_step(lambda tt, y: -theta * y * y, t, x, dt, vo.RKF45)

        return sf

    g = diff.grad_terminal(
        lambda yf: yf, factory, jnp.asarray(1.0, jnp.float64),
        0.0, 1.0, 0.05,
        adaptive=True,
        ctl=vo.StepControl(rtol=1e-8, max_steps=256),  # ~10x the needed steps
    )(1.0)
    assert np.isfinite(float(g))
    # analytic: y(1) = 1/(1+theta); d/dtheta = -1/(1+theta)^2
    np.testing.assert_allclose(float(g), -0.25, rtol=1e-5)


def test_batched_integrate_rejects_unbatched_norm():
    """Regression: an error_norm that reduces the whole batch to one
    scalar would silently couple every lane's step control — must raise."""
    import pytest

    from vec_ode_tpu import lc
    from vec_ode_tpu.driver import integrate, make_grid
    from vec_ode_tpu.rk import RungeKutta

    step = jax.vmap(RungeKutta().make_step_fn(lambda t, y: -y))
    y0 = jnp.ones((4, 2), jnp.float64)
    with pytest.raises(ValueError, match="PER-TRAJECTORY"):
        integrate(step, y0, make_grid(0.0, 1.0, dtype=jnp.float64), 1e-2,
                  adaptive=True, error_norm=lc.norm_l2, batch_shape=(4,))
