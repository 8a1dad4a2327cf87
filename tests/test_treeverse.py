"""Checkpointed (treeverse-style) gradients for NONLINEAR RHS — VERDICT r3 #5.

Two pieces close the last adjoint gap (PARITY.md "Known gaps"):

* ``remat_levels=k`` (driver.resume, scan mode): the bounded scan runs as
  k+1 nested scans of ~T^(1/(k+1)) iterations with every inner level
  ``jax.checkpoint``-ed — binomial checkpointing. Reverse-mode memory drops
  from O(T) stored residuals to O((k+1)·T^(1/(k+1))) carries; measured on
  the compiled XLA temp-buffer analysis below (232x at level 1, T=16384).

* ``grad_safe=True`` (driver.step_once): the accept decision runs on a
  fully stop-gradient pass and the differentiated stepper evaluation sees
  dt=0 on rejected lanes, so a rejected trial that OVERFLOWS inside the
  stepper can no longer NaN the VJP (0-cotangent x inf-residual). The
  accepted-step controller sensitivity is recomputed differentiably
  (measured: detaching it entirely biases a Van-der-Pol gradient by ~4%;
  keeping it brings the gradient within ~0.03% of central differences —
  the residual being the reject-branch h-shrink terms, which are exactly
  zero whenever the trial overflowed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import diff


def _vdp_factory(mu):
    st = vo.RungeKutta()

    def rhs(t, y):
        return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

    return st.make_step_fn(rhs)


def _lv_factory(a):
    # stiff-ish Lotka-Volterra: fast prey growth against slow predation
    st = vo.RungeKutta()

    def rhs(t, y):
        prey, pred = y[0], y[1]
        return jnp.stack([a * prey - 2.0 * prey * pred,
                          -4.0 * pred + 1.5 * prey * pred])

    return st.make_step_fn(rhs)


def _fd(f, x, eps):
    return (float(f(x + eps)) - float(f(x - eps))) / (2 * eps)


def test_vdp_adaptive_gradient_matches_fd():
    y0 = jnp.asarray([2.0, 0.0])
    ctl = vo.StepControl(rtol=1e-6, min_dt=1e-9, max_dt=2.0, max_steps=4096)

    def loss(mu):
        sol = diff.solve_for_grad(_vdp_factory, mu, y0, 0.0, 6.0, 0.5,
                                  adaptive=True, ctl=ctl)  # grad_safe on
        return jnp.sum(sol.y_final ** 2)

    v, g = jax.value_and_grad(loss)(3.0)
    g_fd = _fd(loss, 3.0, 1e-5)
    assert np.isfinite(float(g))
    # measured: 0.94882 vs fd 0.94905 — the 0.03% gap is the dropped
    # reject-branch h-shrink sensitivity (~20 rejects on this run)
    np.testing.assert_allclose(float(g), g_fd, rtol=2e-3)


def test_lotka_volterra_adaptive_gradient_matches_fd():
    y0 = jnp.asarray([1.0, 1.0])
    ctl = vo.StepControl(rtol=1e-6, min_dt=1e-9, max_dt=1.0, max_steps=8192)

    def loss(a):
        sol = diff.solve_for_grad(_lv_factory, a, y0, 0.0, 3.0, 0.1,
                                  adaptive=True, ctl=ctl)
        return jnp.sum((sol.y_final - 1.0) ** 2)

    v, g = jax.value_and_grad(loss)(6.0)
    g_fd = _fd(loss, 6.0, 1e-6)
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), g_fd, rtol=2e-3)


def test_overflowing_rejects_nan_without_grad_safe_and_not_with():
    """Pins the documented caveat AND its fix: y' = a*y^2 from y0=-2 decays
    like -1/(a t) (harmless), but h0 = max_dt = 1e6 makes the first trials
    overflow inside the RK stages (f64 inf by stage 5). The bare scan VJP
    NaNs; grad_safe stays finite with an identical primal."""
    y0 = jnp.asarray([-2.0])
    ctl = vo.StepControl(rtol=1e-6, min_dt=1e-9, max_dt=1e6, max_steps=4096)

    def factory(a):
        st = vo.RungeKutta()
        return st.make_step_fn(lambda t, y: a * y ** 2)

    def loss(a, gs):
        sol = diff.solve_for_grad(factory, a, y0, 0.0, 1e6, 1e6,
                                  adaptive=True, ctl=ctl, grad_safe=gs)
        return 1e6 * jnp.sum(sol.y_final ** 2), (sol.status, sol.n_reject)

    (v_u, (st_u, rej_u)), g_unsafe = jax.value_and_grad(
        lambda a: loss(a, False), has_aux=True)(1.0)
    (v_s, (st_s, rej_s)), g_safe = jax.value_and_grad(
        lambda a: loss(a, True), has_aux=True)(1.0)
    assert int(st_u) == vo.DONE and int(st_s) == vo.DONE
    assert int(rej_u) > 5  # overflowing trials actually happened
    assert float(v_u) == float(v_s)  # primal unchanged by grad_safe
    assert np.isnan(float(g_unsafe))  # the caveat is real
    assert np.isfinite(float(g_safe))  # and fixed


@pytest.mark.parametrize("rl", [1, 2])
def test_remat_levels_gradients_identical(rl):
    y0 = jnp.asarray([2.0, 0.0])
    ctl = vo.StepControl(rtol=1e-6, min_dt=1e-9, max_dt=2.0, max_steps=2048)

    def loss(mu, levels):
        sol = diff.solve_for_grad(_vdp_factory, mu, y0, 0.0, 6.0, 0.5,
                                  adaptive=True, ctl=ctl,
                                  remat_levels=levels)
        return jnp.sum(sol.y_final ** 2)

    v0, g0 = jax.value_and_grad(lambda m: loss(m, 0))(3.0)
    v1, g1 = jax.value_and_grad(lambda m: loss(m, rl))(3.0)
    # same step sequence; XLA fuses the nested and flat loop bodies
    # differently (FMA contraction), so equality holds to rounding only
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-13)
    np.testing.assert_allclose(float(g0), float(g1), rtol=1e-8)


def test_memory_curve_and_1e5_step_gradient():
    """The documented memory curve (XLA temp-buffer analysis of the
    compiled value_and_grad) and the 1e5-step done-criterion.

    Measured on CPU f64 at T=16384 fixed steps (Van der Pol):
      remat_levels=0: ~4.2 MB temp   (O(T) residuals)
      remat_levels=1: ~0.046 MB      (232x smaller, O(sqrt T))
      remat_levels=2: ~0.018 MB      (O(T^(1/3)))
    and at T=100000, remat_levels=2: ~0.025 MB — a 1e5-step nonlinear
    gradient in kilobytes of loop memory, matching central differences."""
    y0 = jnp.asarray([2.0, 0.0])

    def make_loss(T, levels, tf):
        ctl = vo.StepControl(max_steps=T, max_dt=1.0)

        def loss(mu):
            sol = diff.solve_for_grad(
                _vdp_factory, mu, y0, 0.0, tf, tf / T, adaptive=False,
                ctl=ctl, remat_levels=levels, grad_safe=False)
            return jnp.sum(sol.y_final ** 2)

        return loss

    temps = {}
    grads = {}
    for rl in (0, 1, 2):
        f = jax.jit(jax.value_and_grad(make_loss(16384, rl, 16.0)))
        c = f.lower(1.5).compile()
        temps[rl] = c.memory_analysis().temp_size_in_bytes
        grads[rl] = float(f(1.5)[1])
    # the curve: each level cuts memory by a large factor
    assert temps[1] * 20 < temps[0], temps
    assert temps[2] < temps[1], temps
    assert grads[0] == pytest.approx(grads[1], rel=1e-12)
    assert grads[0] == pytest.approx(grads[2], rel=1e-12)

    # 1e5 fixed steps at remat_levels=2: bounded memory, FD-exact gradient
    loss5 = make_loss(100_000, 2, 20.0)
    f5 = jax.jit(jax.value_and_grad(loss5))
    c5 = f5.lower(1.5).compile()
    assert c5.memory_analysis().temp_size_in_bytes < 4 * temps[1]
    v, g = f5(1.5)
    g_fd = _fd(loss5, 1.5, 1e-6)
    np.testing.assert_allclose(float(g), g_fd, rtol=1e-6)


def test_scan_guard_lifted_with_remat():
    # 100000 integration steps + the two grid-hit (t0/tf) iterations
    ctl = vo.StepControl(max_steps=100_050, max_dt=1.0)
    y0 = jnp.asarray([1.0])
    step = vo.RungeKutta().make_step_fn(lambda t, y: -y)
    t_grid = vo.make_grid(0.0, 1.0, dtype=jnp.float64)
    with pytest.raises(ValueError, match="remat_levels"):
        vo.integrate(step, y0, t_grid, 1e-5, adaptive=False, ctl=ctl,
                     method="scan")
    sol = vo.integrate(step, y0, t_grid, 1e-5, adaptive=False, ctl=ctl,
                       method="scan", remat_levels=2)
    assert int(sol.status) == vo.DONE
    np.testing.assert_allclose(float(sol.y_final[0]), np.exp(-1.0),
                               rtol=1e-9)
