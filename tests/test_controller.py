import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vec_ode_tpu.controller import StepControl, controller_update


def oracle_update(h, dx_norm, rtol=1e-4, alpha=0.9, order=3.0,
                  min_dt=1e-6, max_dt=1.0):
    """Pure-python port of handle_step_adaptive (ode.rs:311-334) as oracle."""
    f = rtol / dx_norm if dx_norm > 0 else float("inf")
    fp_lim = min(max(alpha * f ** (1.0 / order), 0.3), 2.0)
    new_h = min(max(fp_lim * h, min_dt), max_dt)
    accept = f > 1.0
    return new_h, accept


@pytest.mark.parametrize(
    "h,dx_norm",
    [
        (1e-3, 1e-5),    # accept, grow
        (1e-3, 1e-4),    # f == 1 -> reject (boundary: reference rejects f<=1)
        (1e-3, 1e-2),    # reject, shrink to 0.3x
        (1e-3, 1.0001e-4),  # barely accept
        (0.9, 1e-9),     # growth clipped by max_dt
        (2e-6, 1e-1),    # shrink clipped by min_dt
        (1e-3, 0.0),     # zero error -> accept with max factor
    ],
)
def test_matches_oracle(h, dx_norm):
    ctl = StepControl()
    new_h, accept = controller_update(
        jnp.asarray(h, jnp.float64), jnp.asarray(dx_norm, jnp.float64), ctl
    )
    oh, oa = oracle_update(h, dx_norm)
    np.testing.assert_allclose(float(new_h), oh, rtol=1e-14)
    assert bool(accept) == oa


def test_reject_at_f_equal_one():
    # reference rejects when f <= 1 (ode.rs:328): f = rtol/norm = exactly 1
    ctl = StepControl(rtol=1e-4)
    _, accept = controller_update(
        jnp.asarray(1e-3, jnp.float64), jnp.asarray(1e-4, jnp.float64), ctl
    )
    assert not bool(accept)


def test_nan_error_rejects_and_shrinks():
    ctl = StepControl()
    new_h, accept = controller_update(
        jnp.asarray(1e-3, jnp.float64), jnp.asarray(np.nan, jnp.float64), ctl
    )
    assert not bool(accept)
    np.testing.assert_allclose(float(new_h), 0.3e-3, rtol=1e-12)


def test_validation():
    with pytest.raises(ValueError):
        StepControl(rtol=-1.0)
    with pytest.raises(ValueError):
        StepControl(min_dt=1.0, max_dt=0.5)


def test_init_h_geometric_mean():
    # with_step_range sets h = sqrt(min*max) (ode.rs:273)
    ctl = StepControl(min_dt=1e-8, max_dt=1e-2)
    np.testing.assert_allclose(ctl.init_h(), 1e-5)


def test_batched_controller():
    ctl = StepControl()
    h = jnp.full((4,), 1e-3, jnp.float64)
    norms = jnp.asarray([1e-5, 1e-2, 0.0, 1e-4], jnp.float64)
    new_h, accept = controller_update(h, norms, ctl)
    assert accept.tolist() == [True, False, True, False]
    expected = [oracle_update(1e-3, float(n))[0] for n in norms]
    np.testing.assert_allclose(np.asarray(new_h), expected, rtol=1e-14)


def test_pi_controller_neutral_without_history():
    # with no history (prev=0), PI reduces to f^kI (neutral proportional term)
    ctl = StepControl(pi=True)
    h, acc = controller_update(
        jnp.asarray(1e-3, jnp.float64), jnp.asarray(1e-5, jnp.float64), ctl,
        prev_err_norm=jnp.asarray(0.0, jnp.float64),
    )
    expect = min(max(0.9 * 10 ** (0.7 / 5.0), 0.3), 2.0) * 1e-3
    np.testing.assert_allclose(float(h), expect, rtol=1e-12)
    assert bool(acc)


def test_pi_default_off_matches_reference():
    # pi=False (default): identical to the reference formula regardless of
    # the history argument
    ctl = StepControl()
    a, _ = controller_update(
        jnp.asarray(1e-3, jnp.float64), jnp.asarray(3e-5, jnp.float64), ctl,
        prev_err_norm=jnp.asarray(7e-5, jnp.float64),
    )
    b, _ = controller_update(
        jnp.asarray(1e-3, jnp.float64), jnp.asarray(3e-5, jnp.float64), ctl,
    )
    assert float(a) == float(b)


def test_pi_fewer_rejects_on_oscillator():
    import vec_ode_tpu as vo

    A = jnp.asarray([[0.0, 8.0], [-8.0, 0.0]], jnp.float64)

    def f(t, y):
        return jnp.einsum("ij,j->i", A, y,
                          precision=jax.lax.Precision.HIGHEST)

    y0 = jnp.asarray([1.0, 0.0], jnp.float64)
    kw = dict(h0=1e-3)
    ref = vo.solve_ivp(f, 0.0, 10.0, y0,
                       ctl=StepControl(rtol=1e-8, max_dt=0.5), **kw)
    pi = vo.solve_ivp(f, 0.0, 10.0, y0,
                      ctl=StepControl(rtol=1e-8, max_dt=0.5, pi=True), **kw)
    assert bool(pi.success) and bool(ref.success)
    # same accuracy class
    np.testing.assert_allclose(
        np.asarray(pi.y_final), np.asarray(ref.y_final), atol=1e-5
    )
    # smoother control: no more rejects than the I-controller
    assert int(pi.n_reject) <= int(ref.n_reject)


def test_pi_zero_error_estimate_no_nan():
    # commuting A(t) = s(t) A0 makes the Magnus-4 error exactly zero;
    # PI must not produce NaN h from inf/inf ratios
    import vec_ode_tpu as vo
    from vec_ode_tpu import exp as vexp

    A0 = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float64)
    sol = vo.solve_linear(
        lambda t: A0 * (1 + 0.3 * jnp.sin(3 * t)), 0.0, 5.0,
        jnp.asarray([1.0, 0.0], jnp.float64),
        stepper=vexp.Magnus4(vexp.DenseSplit()), adaptive=True,
        ctl=StepControl(rtol=1e-9, pi=True, pi_order=3.0), h0=1e-2,
    )
    assert bool(sol.success)
    assert np.isfinite(float(sol.h_final))
    assert int(sol.n_reject) == 0
