"""Event detection (events.py): root-finding of g(t, x(t)) in the masked
driver.

The reference has no event mechanism (SURVEY §5 — its only mid-run control
is the t_list/Chkpt grid, ode.rs:165-176); these tests pin the framework
extension against analytically known crossing times, across every driver
mode: adaptive/fixed, while/scan, vmapped and natively-batched ensembles,
backward time, and the exp-stepper path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import lc
from vec_ode_tpu.events import Event, EventConfig

LN2 = float(np.log(2.0))
TIGHT = vo.StepControl(rtol=1e-10)


def decay(t, y):
    return lc.scale(y, -1.0)


def test_terminal_event_decay():
    # y' = -y, y0 = 1: y crosses 1/2 at t = ln 2
    sol = vo.solve_ivp(
        decay, 0.0, 5.0, jnp.asarray(1.0, jnp.float64), ctl=TIGHT,
        events=Event(lambda t, y: y - 0.5, terminal=True),
    )
    assert int(sol.status) == vo.DONE_EVENT
    assert bool(sol.success)
    assert bool(sol.event_found[0])
    np.testing.assert_allclose(float(sol.event_t[0]), LN2, atol=1e-9)
    np.testing.assert_allclose(float(sol.event_y[0]), 0.5, atol=1e-9)
    # the trajectory stopped AT the event (within the bracket tolerance)
    np.testing.assert_allclose(float(sol.t_final), LN2, atol=1e-7)


def test_nonterminal_event_continues_to_tf():
    sol = vo.solve_ivp(
        decay, 0.0, 2.0, jnp.asarray(1.0, jnp.float64), ctl=TIGHT,
        events=lambda t, y: y - 0.5,  # bare callable => non-terminal
    )
    assert int(sol.status) == vo.DONE
    np.testing.assert_allclose(float(sol.event_t[0]), LN2, atol=1e-9)
    # integration went all the way to tf regardless
    np.testing.assert_allclose(float(sol.t_final), 2.0, rtol=1e-12)
    np.testing.assert_allclose(float(sol.y_final), np.exp(-2.0), rtol=1e-7)


def test_direction_filter_oscillator():
    # x'' = -x with x(0)=1, x'(0)=0: x = cos t. Falling zero at pi/2,
    # rising zero at 3pi/2.
    def f(t, y):
        return jnp.stack([y[1], -y[0]])

    y0 = jnp.asarray([1.0, 0.0], jnp.float64)
    sol = vo.solve_ivp(
        f, 0.0, 7.0, y0, ctl=TIGHT,
        events=[
            Event(lambda t, y: y[0], direction=-1),
            Event(lambda t, y: y[0], direction=+1),
        ],
    )
    np.testing.assert_allclose(float(sol.event_t[0]), np.pi / 2, atol=1e-7)
    np.testing.assert_allclose(
        float(sol.event_t[1]), 3 * np.pi / 2, atol=1e-6
    )
    # the recorded event states sit on the trajectory: x ~ 0, x' ~ -/+ 1
    np.testing.assert_allclose(float(sol.event_y[0][0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(sol.event_y[0][1]), -1.0, atol=1e-6)
    np.testing.assert_allclose(float(sol.event_y[1][1]), 1.0, atol=1e-6)


def test_event_never_found():
    sol = vo.solve_ivp(
        decay, 0.0, 1.0, jnp.asarray(1.0, jnp.float64), ctl=TIGHT,
        events=lambda t, y: y + 1.0,  # y stays positive: no zero
    )
    assert int(sol.status) == vo.DONE
    assert not bool(sol.event_found[0])
    assert np.isinf(float(sol.event_t[0]))


def test_fixed_step_terminal_event():
    sol = vo.solve_ivp(
        decay, 0.0, 5.0, jnp.asarray(1.0, jnp.float64),
        adaptive=False, h0=0.05,
        events=Event(lambda t, y: y - 0.5, terminal=True),
    )
    assert int(sol.status) == vo.DONE_EVENT
    np.testing.assert_allclose(float(sol.event_t[0]), LN2, atol=1e-8)


def test_fixed_step_nonterminal_restores_h():
    # after locating a non-terminal event, the pre-search step size is
    # restored and the fixed-step solve still reaches tf cheaply
    sol = vo.solve_ivp(
        decay, 0.0, 2.0, jnp.asarray(1.0, jnp.float64),
        adaptive=False, h0=0.05,
        events=lambda t, y: y - 0.5,
    )
    assert int(sol.status) == vo.DONE
    np.testing.assert_allclose(float(sol.event_t[0]), LN2, atol=1e-8)
    # 2/0.05 = 40 advancing steps + O(log(h/tol)) search iterations;
    # a lost step size would need ~thousands
    assert int(sol.n_iters) < 120


def test_event_search_not_counted_as_rejects():
    sol = vo.solve_ivp(
        decay, 0.0, 2.0, jnp.asarray(1.0, jnp.float64),
        adaptive=False, h0=0.05,
        events=lambda t, y: y - 0.5,
    )
    # fixed-step solves have no numerical rejections; the bracket-search
    # vetoes must not leak into the reject statistics
    assert int(sol.n_reject) == 0


def test_event_with_save_grid():
    sol = vo.solve_ivp(
        decay, 0.0, 2.0, jnp.asarray(1.0, jnp.float64), ctl=TIGHT,
        save_at=[0.5, 1.0, 1.5],
        events=lambda t, y: y - 0.5,
    )
    np.testing.assert_allclose(float(sol.event_t[0]), LN2, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(sol.ys), np.exp(-np.asarray(sol.ts)), rtol=1e-7
    )


def test_terminal_event_scan_method():
    sol = vo.solve_ivp(
        decay, 0.0, 5.0, jnp.asarray(1.0, jnp.float64),
        ctl=vo.StepControl(rtol=1e-10, max_steps=400), method="scan",
        events=Event(lambda t, y: y - 0.5, terminal=True),
    )
    assert int(sol.status) == vo.DONE_EVENT
    np.testing.assert_allclose(float(sol.event_t[0]), LN2, atol=1e-9)


def test_backward_integration_event():
    # integrate y' = -y BACKWARD from t0=0 (y=1) to tf=-2: y(t) = e^{-t}
    # grows into the past and crosses 2 at t = -ln 2
    sol = vo.solve_ivp(
        decay, 0.0, -2.0, jnp.asarray(1.0, jnp.float64), ctl=TIGHT,
        events=lambda t, y: y - 2.0,
    )
    assert int(sol.status) == vo.DONE
    assert bool(sol.event_found[0])
    np.testing.assert_allclose(float(sol.event_t[0]), -LN2, atol=1e-9)
    np.testing.assert_allclose(float(sol.event_y[0]), 2.0, atol=1e-9)


def test_backward_event_direction_mirrored():
    # y = e^{-t} seen in USER time: rising in the past direction means the
    # crossing of 2 is a RISING event as t decreases... direction refers to
    # user time: g = y - 2 goes - -> + as user time DEcreases; along the
    # integration (toward the past) g increases, so in user-time direction
    # it is FALLING (+1 in reversed coordinates). The mirror maps a
    # user-specified direction=-1 (falling in user time, i.e. g decreases
    # as t increases) to the crossing we see marching backward.
    sol = vo.solve_ivp(
        decay, 0.0, -2.0, jnp.asarray(1.0, jnp.float64), ctl=TIGHT,
        events=Event(lambda t, y: y - 2.0, direction=-1),
    )
    assert bool(sol.event_found[0])
    np.testing.assert_allclose(float(sol.event_t[0]), -LN2, atol=1e-9)
    # the opposite direction never fires
    sol2 = vo.solve_ivp(
        decay, 0.0, -2.0, jnp.asarray(1.0, jnp.float64), ctl=TIGHT,
        events=Event(lambda t, y: y - 2.0, direction=+1),
    )
    assert not bool(sol2.event_found[0])


def test_ensemble_events_vmap():
    from vec_ode_tpu.parallel import ensemble_solve

    y0 = jnp.asarray([1.0, 2.0, 4.0, 8.0], jnp.float64)[:, None]
    sol = ensemble_solve(
        decay, y0, 0.0, 6.0, ctl=TIGHT,
        events=Event(lambda t, y: y[0] - 0.5, terminal=True),
    )
    expect = np.log(np.asarray([1.0, 2.0, 4.0, 8.0]) / 0.5)
    assert np.all(np.asarray(sol.status) == vo.DONE_EVENT)
    np.testing.assert_allclose(
        np.asarray(sol.event_t)[:, 0], expect, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(sol.event_y)[:, 0, 0], 0.5, atol=1e-8
    )


def test_batched_driver_events():
    # the natively-batched carry (batch_shape=()) path: elementwise RHS so
    # a single rk_step IS the batched stepper; per-trajectory error norms
    from vec_ode_tpu.rk import rk_step

    def step(t, x, dt):
        return rk_step(decay, t, x, dt, vo.RKF45)

    y0 = jnp.asarray([1.0, 3.0], jnp.float64)
    t_grid = vo.make_grid(0.0, 6.0, dtype=jnp.float64)
    from vec_ode_tpu.events import as_event_config

    sol = vo.integrate(
        step, y0, t_grid, 0.05, adaptive=True, ctl=TIGHT,
        error_norm=lambda e: jnp.abs(e), batch_shape=(2,),
        event_cfg=as_event_config(
            Event(lambda t, y: y - 0.5, terminal=True)
        ),
    )
    expect = np.log(np.asarray([1.0, 3.0]) / 0.5)
    assert np.all(np.asarray(sol.status) == vo.DONE_EVENT)
    np.testing.assert_allclose(
        np.asarray(sol.event_t)[:, 0], expect, atol=1e-8
    )


def test_solve_linear_event():
    # rotation: y = (cos t, sin t); y[1] - 1/2 first crosses at pi/6
    A = jnp.asarray([[0.0, -1.0], [1.0, 0.0]], jnp.float64)
    from vec_ode_tpu.exp import DenseSplit, Magnus4

    sol = vo.solve_linear(
        lambda t: A, 0.0, 2.0, jnp.asarray([1.0, 0.0], jnp.float64),
        stepper=Magnus4(DenseSplit()), adaptive=True, ctl=TIGHT,
        events=Event(lambda t, y: y[1] - 0.5, terminal=True),
    )
    assert int(sol.status) == vo.DONE_EVENT
    np.testing.assert_allclose(float(sol.event_t[0]), np.pi / 6, atol=1e-7)


def test_record_y_off():
    sol = vo.solve_ivp(
        decay, 0.0, 2.0, jnp.asarray(1.0, jnp.float64), ctl=TIGHT,
        events=EventConfig(
            events=(Event(lambda t, y: y - 0.5),), record_y=False
        ),
    )
    np.testing.assert_allclose(float(sol.event_t[0]), LN2, atol=1e-9)
    assert sol.event_y is None


def test_custom_t_tol():
    sol = vo.solve_ivp(
        decay, 0.0, 5.0, jnp.asarray(1.0, jnp.float64), ctl=TIGHT,
        events=EventConfig(
            events=(Event(lambda t, y: y - 0.5, terminal=True),),
            t_tol=1e-3,
        ),
    )
    # loose bracket: located within t_tol but not much better than that
    assert abs(float(sol.event_t[0]) - LN2) < 1e-3


def test_config_validation():
    with pytest.raises(ValueError):
        Event(lambda t, y: y, direction=2)
    with pytest.raises(ValueError):
        EventConfig(events=())
    with pytest.raises(TypeError):
        EventConfig(events=(lambda t, y: y,))


def test_event_time_gradient_scan():
    # event times are DIFFERENTIABLE through method="scan": t_ev =
    # t + theta*dt is pure masked arithmetic in the integrated states, so
    # as the bracket tightens to t_tol the reverse-mode gradient converges
    # to the implicit-function-theorem sensitivity dt*/dy0 = -g_y f /
    # (g_t + g_y f)|_{t*}. Here t* = ln(y0/0.5) so dt*/dy0 = 1/y0.
    ctl = vo.StepControl(rtol=1e-10, max_steps=300)

    def tstar(y0):
        sol = vo.solve_ivp(
            decay, 0.0, 5.0, y0, ctl=ctl, method="scan",
            events=Event(lambda t, y: y - 0.5, terminal=True),
        )
        return sol.event_t[0]

    y0 = jnp.asarray(1.3, jnp.float64)
    np.testing.assert_allclose(float(tstar(y0)), np.log(1.3 / 0.5),
                               atol=1e-8)
    np.testing.assert_allclose(float(jax.grad(tstar)(y0)), 1 / 1.3,
                               atol=1e-7)


def test_pytree_state_events():
    # events over a dict state; g reads one leaf
    def f(t, y):
        return {"a": -y["a"], "b": -2.0 * y["b"]}

    y0 = {"a": jnp.asarray(1.0, jnp.float64),
          "b": jnp.asarray(1.0, jnp.float64)}
    sol = vo.solve_ivp(
        f, 0.0, 3.0, y0, ctl=TIGHT,
        events=lambda t, y: y["b"] - 0.25,
    )
    np.testing.assert_allclose(float(sol.event_t[0]), LN2, atol=1e-8)
    np.testing.assert_allclose(float(sol.event_y["b"][0]), 0.25, atol=1e-8)
    np.testing.assert_allclose(
        float(sol.event_y["a"][0]), np.exp(-LN2), atol=1e-7
    )
