"""fast_error on the MODULATED Magnus-4 (exp/modulated.py): the embedded
error becomes ONE commutator-basis contraction on the advanced state
(dv = w2*xf) instead of a second full Taylor chain — the modulated twin of
exp/magnus.py Magnus4(fast_error=True), with exact f64 parity to it.

Runs on every tier: XLA fallback, per-step Pallas kernel, fused loop
kernel, lane-packed loop (interpret mode pins each to the XLA driver).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.models import DrivenDense, LandauZener
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_solve


def _psi0(d, B=None, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    shape = (d,) if B is None else (B, d)
    z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    return cp.from_complex(z, dtype)


def test_fast_error_matches_generic_exactly():
    """f64, single trajectory: modulated fast_error == generic dense-split
    Magnus4(fast_error=True) — identical accept/reject sequences (the two
    paths compute the SAME w2·xf estimate)."""
    model = DrivenDense.make(d=8, seed=0)
    mod = model.modulated(jnp.float64)
    psi0 = _psi0(8, seed=5)
    op_fn = lambda t: model.op_pair(t, jnp.float64)
    ctl = vo.StepControl(rtol=1e-7, min_dt=1e-6, max_dt=0.3)
    sm = vo.solve_linear(
        None, 0.0, 1.5, psi0,
        stepper=vexp.MagnusModulated4(mod, fast_error=True),
        adaptive=True, ctl=ctl, h0=1e-2)
    sg = vo.solve_linear(
        op_fn, 0.0, 1.5, psi0,
        stepper=vexp.Magnus4(vexp.DenseCplxSplit(), fast_error=True),
        adaptive=True, ctl=ctl, h0=1e-2)
    assert int(sm.status) == vo.DONE == int(sg.status)
    assert int(sm.n_accept) == int(sg.n_accept)
    assert int(sm.n_reject) == int(sg.n_reject)
    np.testing.assert_allclose(np.asarray(sm.y_final.re),
                               np.asarray(sg.y_final.re),
                               rtol=1e-12, atol=1e-12)


def test_fast_error_accuracy_vs_pair():
    """The fast estimate changes only the error CONSTANT: at the same
    rtol, the accepted solution stays within tolerance-scale distance of
    the pair default's, and unitarity holds."""
    model = DrivenDense.make(d=8, seed=0)
    mod = model.modulated(jnp.float64)
    psi0 = _psi0(8, seed=7)
    ctl = vo.StepControl(rtol=1e-8, min_dt=1e-6, max_dt=0.3)
    sf = vo.solve_linear(None, 0.0, 2.0, psi0,
                         stepper=vexp.MagnusModulated4(mod,
                                                       fast_error=True),
                         adaptive=True, ctl=ctl, h0=1e-2)
    sp = vo.solve_linear(None, 0.0, 2.0, psi0,
                         stepper=vexp.MagnusModulated4(mod),
                         adaptive=True, ctl=ctl, h0=1e-2)
    n = float(jnp.sum(sf.y_final.re ** 2 + sf.y_final.im ** 2))
    assert abs(n - 1) < 1e-10
    d = float(jnp.abs(sf.y_final.re - sp.y_final.re).max())
    assert d < 1e-6, d


def _run_fused(stepper, y0, t_grid, ctl):
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        return stepper.fused_loop_solve(y0, t_grid, 1e-2, ctl=ctl,
                                        adaptive=True)
    finally:
        jax.default_backend = orig


def test_fast_error_fused_loop_matches_xla_driver():
    """d=64 complex, fused loop kernel (interpret): the err-action path
    (C=1 + one basis contraction) matches the XLA driver running the same
    fast_error stepper."""
    model = DrivenDense.make(d=64, seed=0)
    mod = model.modulated(jnp.float32)
    y0 = _psi0(64, B=16, seed=21, dtype=jnp.float32)
    from vec_ode_tpu.driver import integrate, make_grid

    t_grid = make_grid(jnp.float32(0.0), jnp.float32(0.5),
                       dtype=jnp.float32)
    ctl = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.2, max_steps=500)
    st_f = vexp.MagnusModulated4(mod, interpret=True, fast_error=True)
    sol_f = _run_fused(st_f, y0, t_grid, ctl)
    assert sol_f is not None, "fused loop did not engage with fast_error"
    assert sol_f.path.startswith("pallas-loop")

    st_x = vexp.MagnusModulated4(mod, use_pallas=False, fast_error=True)
    sol_x = integrate(
        st_x.make_step_fn(), y0, t_grid, 1e-2, adaptive=True, ctl=ctl,
        error_norm=st_x.error_norm, batch_shape=(y0.re.shape[0],),
    )
    assert (np.asarray(sol_f.status) == vo.DONE).all()
    a_f, a_x = np.asarray(sol_f.n_accept), np.asarray(sol_x.n_accept)
    assert (a_f == a_x).mean() > 0.8, (a_f, a_x)
    np.testing.assert_allclose(np.asarray(sol_f.y_final.re),
                               np.asarray(sol_x.y_final.re),
                               rtol=1e-4, atol=1e-4)


def test_fast_error_per_step_kernel_matches_xla():
    """Per-step fused kernel (interpret) == XLA fallback of the SAME
    fast_error stepper: y and the error estimate."""
    model = DrivenDense.make(d=64, seed=0)
    mod = model.modulated(jnp.float32)
    y0 = _psi0(64, B=16, seed=3, dtype=jnp.float32)
    t = jnp.zeros((16,), jnp.float32)
    dt = jnp.full((16,), 5e-2, jnp.float32)

    st_p = vexp.MagnusModulated4(mod, interpret=True, fast_error=True)
    st_x = vexp.MagnusModulated4(mod, use_pallas=False, fast_error=True)
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        yf_p, e_p = st_p.make_step_fn()(t, y0, dt)
    finally:
        jax.default_backend = orig
    yf_x, e_x = st_x.make_step_fn()(t, y0, dt)
    np.testing.assert_allclose(np.asarray(yf_p.re), np.asarray(yf_x.re),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=2e-3, atol=2e-8)
    assert float(np.asarray(e_x).max()) > 0.0


def test_fast_error_lane_packed():
    """Lane-packed fused loop with fast_error: the err action rides the
    one-hot group reduction; matches the XLA driver."""
    lz = LandauZener(v=2.0, delta=0.4)
    mod = lz.modulated(jnp.float32)
    B = 256
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    ctl = vo.StepControl(rtol=1e-5, max_steps=4000, min_dt=1e-4,
                         max_dt=1.0)
    grid = jnp.asarray([-20.0, 20.0], jnp.float32)
    st = vexp.MagnusModulated4(mod, interpret=True, fast_error=True)
    sol = _run_fused(st, y0, grid, ctl)
    assert sol is not None
    assert sol.path == "pallas-loop-persistent-packed"
    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MagnusModulated4(mod, use_pallas=False,
                                      fast_error=True),
        adaptive=True, h0=1e-2, ctl=ctl, time_dtype=jnp.float32,
    )
    assert (np.asarray(sol.status) == vo.DONE).all()
    a_f, a_x = np.asarray(sol.n_accept), np.asarray(oracle.n_accept)
    assert (a_f == a_x).mean() > 0.8, (a_f, a_x)
    np.testing.assert_allclose(np.asarray(sol.y_final.re),
                               np.asarray(oracle.y_final.re),
                               rtol=2e-4, atol=2e-4)


def test_fast_error_with_weighted_norm():
    """fast_error + a declared WeightedNorm compose: the w2*xf estimate is
    normed by the declaration — exact f64 parity with the generic
    fast_error stepper under the same norm as a driver-applied callable,
    and the packed loop kernel matches the XLA fallback."""
    from vec_ode_tpu import lc

    model = DrivenDense.make(d=8, seed=0)
    mod = model.modulated(jnp.float64)
    psi0 = _psi0(8, seed=5)
    op_fn = lambda t: model.op_pair(t, jnp.float64)
    w = np.linspace(0.25, 3.0, 8)
    wn = lc.WeightedNorm("l2", weights=w)
    ctl = vo.StepControl(rtol=1e-7, min_dt=1e-6, max_dt=0.3)
    sm = vo.solve_linear(
        None, 0.0, 1.5, psi0,
        stepper=vexp.MagnusModulated4(mod, fast_error=True, norm=wn),
        adaptive=True, ctl=ctl, h0=1e-2)
    sg = vo.solve_linear(
        op_fn, 0.0, 1.5, psi0,
        stepper=vexp.Magnus4(vexp.DenseCplxSplit(), fast_error=True),
        error_norm=wn, adaptive=True, ctl=ctl, h0=1e-2)
    assert int(sm.n_accept) == int(sg.n_accept)
    assert int(sm.n_reject) == int(sg.n_reject)
    np.testing.assert_allclose(np.asarray(sm.y_final.re),
                               np.asarray(sg.y_final.re),
                               rtol=1e-12, atol=1e-12)

    # packed kernel x fast_error x norm vs XLA driver (f32)
    lz = LandauZener(v=2.0, delta=0.4)
    modz = lz.modulated(jnp.float32)
    B = 256
    p0 = np.zeros((B, 2), np.complex64)
    p0[:, 0] = 1.0
    y0 = cp.from_complex(p0, jnp.float32)
    wnz = lc.WeightedNorm("l2", weights=np.asarray([2.0, 0.5], np.float32))
    ctlz = vo.StepControl(rtol=1e-5, max_steps=4000, min_dt=1e-4,
                          max_dt=1.0)
    st = vexp.MagnusModulated4(modz, interpret=True, fast_error=True,
                               norm=wnz)
    sol = _run_fused(st, y0, jnp.asarray([-20.0, 20.0], jnp.float32), ctlz)
    assert sol is not None and sol.path.endswith("-packed")
    oracle = ensemble_solve(
        modz, y0, -20.0, 20.0,
        stepper=vexp.MagnusModulated4(modz, use_pallas=False,
                                      fast_error=True, norm=wnz),
        adaptive=True, h0=1e-2, ctl=ctlz, time_dtype=jnp.float32,
    )
    a_f, a_x = np.asarray(sol.n_accept), np.asarray(oracle.n_accept)
    assert (a_f == a_x).mean() > 0.8, (a_f, a_x)
    np.testing.assert_allclose(np.asarray(sol.y_final.re),
                               np.asarray(oracle.y_final.re),
                               rtol=2e-4, atol=2e-4)
