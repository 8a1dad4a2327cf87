"""FSAL slope reuse (rk.rk_step_fsal + the driver's stepper carry).

The reference's rk_step always evaluates stage 1 (rk.rs:111); for FSAL
tableaus (DOPRI5, BOSH32) advancing the b solution, the last stage of an
accepted step IS the next step's first stage. These tests pin:
  * trajectories are UNCHANGED vs the non-FSAL stepper (same tableau, same
    controller decisions) — including through rejected steps;
  * the nfev counter drops to 1 + (s-1) * attempts;
  * misuse (non-FSAL tableau / advance_lower) raises.

The bitwise-identity tests pin ``time_compensated=False``: FSAL's exactness
argument needs t_next == fl(t + dt) bit-for-bit (the cached last stage was
evaluated at t + 1.0*dt), while the default compensated clock rounds t_next
through the residual word — physically identical, one ulp apart.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu.models import VanDerPol
from vec_ode_tpu.parallel import ensemble_solve
from vec_ode_tpu.tableaus import BOSH32, DOPRI5, RKF45


def _stiffish(t, y):
    # nonlinear with varying scales -> exercises accepts AND rejects
    return jnp.stack([y[1], -25.0 * y[0] - 2.0 * y[1] + jnp.sin(3.0 * t)])


@pytest.mark.parametrize("tab", [DOPRI5, BOSH32])
def test_fsal_tableau_detection(tab):
    assert tab.is_fsal


def test_non_fsal_tableau_detection():
    assert not RKF45.is_fsal


@pytest.mark.parametrize("tab,s", [(DOPRI5, 7), (BOSH32, 4)])
def test_fsal_trajectory_identical_and_nfev(tab, s):
    y0 = jnp.asarray([1.0, 0.0])
    ctl = vo.StepControl(rtol=1e-7, min_dt=1e-7, max_dt=0.5, max_steps=5000,
                         time_compensated=False)

    st_plain = vo.RungeKutta(tab, advance_lower=False, fsal=False)
    st_fsal = vo.RungeKutta(tab, advance_lower=False)
    assert st_fsal.use_fsal and not st_plain.use_fsal

    sol_p = vo.solve_ivp(_stiffish, 0.0, 3.0, y0, stepper=st_plain, ctl=ctl)
    sol_f = vo.solve_ivp(_stiffish, 0.0, 3.0, y0, stepper=st_fsal, ctl=ctl)

    assert int(sol_p.status) == vo.DONE and int(sol_f.status) == vo.DONE
    # FSAL reuses the EXACT same slope values -> bitwise-identical stages
    assert int(sol_f.n_accept) == int(sol_p.n_accept)
    assert int(sol_f.n_reject) == int(sol_p.n_reject)
    np.testing.assert_array_equal(np.asarray(sol_f.y_final),
                                  np.asarray(sol_p.y_final))
    if tab is DOPRI5:  # BOSH32's smaller steps never reject here
        assert int(sol_p.n_reject) > 0, "rejects not exercised"

    attempts = int(sol_f.n_accept) + int(sol_f.n_reject)
    assert int(sol_f.n_rhs_evals) == 1 + (s - 1) * attempts
    assert int(sol_p.n_rhs_evals) == s * attempts


def test_fsal_accuracy_vs_closed_form():
    A = np.array([[-1.0, 0.4], [0.0, -2.0]])
    y0 = jnp.asarray([1.0, 1.0])
    f = lambda t, y: jnp.asarray(A) @ y
    sol = vo.solve_ivp(f, 0.0, 2.0, y0,
                       stepper=vo.RungeKutta(DOPRI5, advance_lower=False),
                       ctl=vo.StepControl(rtol=1e-9, min_dt=1e-8, max_dt=0.5))
    import scipy.linalg as sla

    ref = sla.expm(2.0 * A) @ np.asarray(y0)
    assert int(sol.status) == vo.DONE
    np.testing.assert_allclose(np.asarray(sol.y_final), ref, rtol=1e-7)


def test_fsal_under_vmap_ensemble():
    m = VanDerPol(mu=1.0)
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.uniform(-2, 2, (8, 2)))
    ctl = vo.StepControl(rtol=1e-6, min_dt=1e-7, max_dt=0.5, max_steps=5000,
                         time_compensated=False)
    sol_f = ensemble_solve(m.rhs, y0, 0.0, 4.0,
                           stepper=vo.RungeKutta(DOPRI5,
                                                 advance_lower=False),
                           ctl=ctl)
    sol_p = ensemble_solve(m.rhs, y0, 0.0, 4.0,
                           stepper=vo.RungeKutta(DOPRI5, advance_lower=False,
                                                 fsal=False),
                           ctl=ctl)
    assert (np.asarray(sol_f.status) == vo.DONE).all()
    np.testing.assert_array_equal(np.asarray(sol_f.n_accept),
                                  np.asarray(sol_p.n_accept))
    np.testing.assert_array_equal(np.asarray(sol_f.y_final),
                                  np.asarray(sol_p.y_final))


def test_fsal_misuse_raises():
    with pytest.raises(ValueError, match="FSAL"):
        vo.RungeKutta(RKF45, fsal=True).use_fsal
    with pytest.raises(ValueError, match="FSAL"):
        vo.RungeKutta(DOPRI5, advance_lower=True, fsal=True).use_fsal


def test_fsal_grid_hitting_save_at():
    """Carry must survive grid-hit (Chkpt) iterations untouched."""
    y0 = jnp.asarray([1.0, 0.0])
    ctl = vo.StepControl(rtol=1e-7, min_dt=1e-7, max_dt=0.5,
                         time_compensated=False)
    kw = dict(save_at=jnp.asarray([0.7, 1.3]), ctl=ctl)
    sol_f = vo.solve_ivp(_stiffish, 0.0, 3.0, y0,
                         stepper=vo.RungeKutta(DOPRI5, advance_lower=False),
                         **kw)
    sol_p = vo.solve_ivp(_stiffish, 0.0, 3.0, y0,
                         stepper=vo.RungeKutta(DOPRI5, advance_lower=False,
                                               fsal=False), **kw)
    assert int(sol_f.status) == vo.DONE
    np.testing.assert_array_equal(np.asarray(sol_f.ys),
                                  np.asarray(sol_p.ys))
