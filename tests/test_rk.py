import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import lc
from vec_ode_tpu.rk import rk_step


def f_decay(t, y):
    return -y


def test_rkf45_single_step_order():
    # one RKF45 step of exp decay: b-combo is 5th order, b_err-combo 4th order
    y0 = jnp.asarray(1.0, jnp.float64)
    dt = 0.1
    x4, err = rk_step(f_decay, 0.0, y0, dt, vo.RKF45)
    exact = np.exp(-dt)
    x5 = x4 + err  # x_b = x_berr + (x_b - x_berr)
    assert abs(float(x5) - exact) < 5e-9   # 5th order local error ~ dt^6
    assert abs(float(x4) - exact) < 5e-8   # 4th order local error ~ dt^5
    # reference advances the LOWER order solution in adaptive mode
    assert abs(float(x4) - exact) > abs(float(x5) - exact)


def test_rk_step_no_embedded():
    y0 = jnp.asarray(1.0, jnp.float64)
    x, err = rk_step(f_decay, 0.0, y0, 0.1, vo.RKF45, embedded=False)
    assert err is None
    assert abs(float(x) - np.exp(-0.1)) < 5e-9  # advances b (5th order)


def test_rk4_classic_step():
    y0 = jnp.asarray(1.0, jnp.float64)
    x, err = rk_step(f_decay, 0.0, y0, 0.1, vo.RK4)
    assert err is None
    assert abs(float(x) - np.exp(-0.1)) < 1e-7


def test_fixed_step_integration_matches_reference_problem():
    # the reference's test_rk45_2 (impls/nalgebra.rs:72-89): y0'=-y0, y1'=-2y1
    # fixed h=1e-4 over [0,2]  — but with h=1e-3 for test speed
    y0 = jnp.asarray([1.0, 1.0], jnp.float64)

    def g(t, y):
        return y * jnp.asarray([-1.0, -2.0])

    sol = vo.solve_ivp(g, 0.0, 2.0, y0, adaptive=False, h0=1e-3)
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.t_final), 2.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sol.y_final), [np.exp(-2.0), np.exp(-4.0)], rtol=1e-10
    )
    # fixed-step advances the lower-order (b_err) solution per reference
    # semantics; step count = ~2.0/1e-3 (+1 possible float-rounding sliver)
    assert 2000 <= int(sol.n_accept) <= 2001
    assert int(sol.n_reject) == 0


def test_adaptive_integration_scalar():
    # the reference's test_rk45_f64 (impls/nalgebra.rs:91-107): y'=-y adaptive
    sol = vo.solve_ivp(
        f_decay,
        0.0,
        2.0,
        jnp.asarray(1.0, jnp.float64),
        ctl=vo.StepControl(rtol=1e-10, atol=1e-10, min_dt=1e-10),
        h0=1e-4,
    )
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.y_final), np.exp(-2.0), rtol=1e-7)
    assert int(sol.n_accept) > 0


def test_adaptive_complex_state():
    # test_rk45_1 analog (impls/nalgebra.rs:52-70): complex 2-dim decay
    y0 = jnp.asarray([1.0 + 0.0j, 1.0 + 0.0j], jnp.complex128)

    def g(t, y):
        return y * jnp.asarray([-1.0, -2.0 + 0.0j])

    sol = vo.solve_ivp(g, 0.0, 2.0, y0, ctl=vo.StepControl(rtol=1e-8))
    assert bool(sol.success)
    # the reference accept test is on the *absolute* error norm (rtol only),
    # so global relative error on the smaller component is ~n_steps*rtol/|y|
    np.testing.assert_allclose(
        np.asarray(sol.y_final), [np.exp(-2.0), np.exp(-4.0)], rtol=1e-5
    )


def test_save_at_grid_hit_exactly():
    save = jnp.asarray([0.5, 1.0, 1.5], jnp.float64)
    sol = vo.solve_ivp(
        f_decay, 0.0, 2.0, jnp.asarray(1.0, jnp.float64), save_at=save
    )
    np.testing.assert_array_equal(
        np.asarray(sol.ts), [0.0, 0.5, 1.0, 1.5, 2.0]
    )
    np.testing.assert_allclose(
        np.asarray(sol.ys), np.exp(-np.asarray(sol.ts)), rtol=1e-3
    )
    # ys[0] must be exactly y0 (the reference emits Chkpt at t0 first)
    assert float(sol.ys[0]) == 1.0


def test_pytree_state():
    y0 = {"p": jnp.asarray([1.0, 2.0]), "q": jnp.asarray(3.0)}

    def g(t, y):
        return {"p": -y["p"], "q": -2.0 * y["q"]}

    sol = vo.solve_ivp(g, 0.0, 1.0, y0, ctl=vo.StepControl(rtol=1e-8))
    np.testing.assert_allclose(
        np.asarray(sol.y_final["p"]), np.asarray([1.0, 2.0]) * np.exp(-1),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(sol.y_final["q"]), 3.0 * np.exp(-2.0), rtol=1e-6
    )


def test_jit_and_grad():
    @jax.jit
    def terminal(y0):
        sol = vo.solve_ivp(f_decay, 0.0, 1.0, y0, adaptive=False, h0=0.01)
        return sol.y_final

    y0 = jnp.asarray(2.0, jnp.float64)
    np.testing.assert_allclose(float(terminal(y0)), 2 * np.exp(-1), rtol=1e-9)


def test_convergence_order_rkf45_lower():
    # global error slope of the advanced (4th-order) solution ~ h^4
    errs = []
    hs = [0.05, 0.025, 0.0125]
    for h in hs:
        sol = vo.solve_ivp(
            f_decay, 0.0, 1.0, jnp.asarray(1.0, jnp.float64),
            adaptive=False, h0=h,
        )
        errs.append(abs(float(sol.y_final) - np.exp(-1)))
    rate = np.log2(errs[0] / errs[1])
    assert 3.5 < rate < 5.5  # reference advances b_err in embedded mode... see rk.py


def test_max_steps_guard():
    sol = vo.solve_ivp(
        f_decay, 0.0, 1e6, jnp.asarray(1.0, jnp.float64),
        adaptive=False, h0=1e-3,
        ctl=vo.StepControl(max_steps=100),
    )
    assert int(sol.status) == vo.ERR_MAX_STEPS


@pytest.mark.parametrize("tab_name,order", [
    ("dopri5", 4),      # advances b_err (4th) in reference-compat mode
    ("bosh32", 2),
    ("cash_karp", 4),
])
def test_extra_tableaus_adaptive_and_order(tab_name, order):
    tab = vo.TABLEAUS[tab_name]
    # adaptive golden run
    sol = vo.solve_ivp(
        f_decay, 0.0, 2.0, jnp.asarray(1.0, jnp.float64),
        stepper=vo.RungeKutta(tab),
        ctl=vo.StepControl(rtol=1e-9, min_dt=1e-8), h0=1e-3,
    )
    assert bool(sol.success)
    np.testing.assert_allclose(float(sol.y_final), np.exp(-2.0), atol=1e-6)
    # fixed-step convergence order of the advanced (lower) solution
    errs = []
    for h in [0.1, 0.05]:
        s2 = vo.solve_ivp(
            f_decay, 0.0, 1.0, jnp.asarray(1.0, jnp.float64),
            stepper=vo.RungeKutta(tab), adaptive=False, h0=h,
        )
        errs.append(abs(float(s2.y_final) - np.exp(-1.0)))
    rate = np.log2(errs[0] / errs[1])
    assert order - 0.7 < rate < order + 1.5, (tab_name, errs, rate)


def test_advance_higher_local_extrapolation():
    # advance_lower=False (local extrapolation) gives the 5th-order solution
    lo = vo.solve_ivp(
        f_decay, 0.0, 1.0, jnp.asarray(1.0, jnp.float64),
        stepper=vo.RungeKutta(vo.RKF45, advance_lower=True),
        adaptive=False, h0=0.05,
    )
    hi = vo.solve_ivp(
        f_decay, 0.0, 1.0, jnp.asarray(1.0, jnp.float64),
        stepper=vo.RungeKutta(vo.RKF45, advance_lower=False),
        adaptive=False, h0=0.05,
    )
    e_lo = abs(float(lo.y_final) - np.exp(-1.0))
    e_hi = abs(float(hi.y_final) - np.exp(-1.0))
    assert e_hi < e_lo / 10  # 5th order clearly beats 4th at this h
