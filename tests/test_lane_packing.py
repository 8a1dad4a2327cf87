"""Lane-packed fused-loop integration for small widened dims (exp/
modulated.py:_fused_loop_run): D | 128 packs G = 128/D trajectories per
kernel row over a block-diagonal kron(I_G, M_k) basis. Exact only in
lockstep, so it engages for FIXED-step solves on a shared grid — the
reference's bread-and-butter 2-level regime (BASELINE config 3,
magnus.rs:10-26 semantics).

Interpret-mode tests pin the packed kernel to the XLA driver
(driver.step_once) like every other fused path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.models import LandauZener
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_solve


def _lz_setup(B=256, dtype=jnp.float32):
    lz = LandauZener(v=2.0, delta=0.4)
    mod = lz.modulated(dtype)
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    return lz, mod, cp.from_complex(psi0, dtype)


def test_packed_matches_xla_driver_midpoint():
    _, mod, y0 = _lz_setup()
    ctl = vo.StepControl(rtol=1e-6, max_steps=2000)
    grid = jnp.asarray([-20.0, 20.0], jnp.float32)
    st = vexp.MidpointModulated(mod, interpret=True)
    sol = st.fused_loop_solve(y0, grid, 40.0 / 500, ctl=ctl,
                              adaptive=False)
    assert sol is not None
    assert sol.path == "pallas-loop-persistent-packed"
    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MidpointModulated(mod, use_pallas=False),
        adaptive=False, h0=40.0 / 500, time_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(sol.status),
                                  np.asarray(oracle.status))
    np.testing.assert_array_equal(np.asarray(sol.n_accept),
                                  np.asarray(oracle.n_accept))
    np.testing.assert_allclose(np.asarray(sol.t_final),
                               np.asarray(oracle.t_final), rtol=1e-6)
    for a, b in [(sol.y_final.re, oracle.y_final.re),
                 (sol.y_final.im, oracle.y_final.im)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6)


def test_packed_magnus4_fixed_step():
    _, mod, y0 = _lz_setup()
    ctl = vo.StepControl(rtol=1e-6, max_steps=2000)
    grid = jnp.asarray([-20.0, 20.0], jnp.float32)
    st = vexp.MagnusModulated4(mod, adaptive=False, interpret=True)
    sol = st.fused_loop_solve(y0, grid, 40.0 / 400, ctl=ctl,
                              adaptive=False)
    assert sol is not None and sol.path.endswith("-packed")
    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MagnusModulated4(mod, adaptive=False,
                                      use_pallas=False),
        adaptive=False, h0=40.0 / 400, time_dtype=jnp.float32,
    )
    for a, b in [(sol.y_final.re, oracle.y_final.re),
                 (sol.y_final.im, oracle.y_final.im)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6)


def test_packed_interior_saves_roundtrip():
    _, mod, y0 = _lz_setup()
    ctl = vo.StepControl(rtol=1e-6, max_steps=4000)
    grid = jnp.asarray([-20.0, -5.0, 0.0, 5.0, 20.0], jnp.float32)
    st = vexp.MidpointModulated(mod, interpret=True)
    sol = st.fused_loop_solve(y0, grid, 40.0 / 500, ctl=ctl,
                              adaptive=False)
    assert sol is not None
    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MidpointModulated(mod, use_pallas=False),
        adaptive=False, h0=40.0 / 500, time_dtype=jnp.float32,
        save_at=grid[1:-1],
    )
    assert sol.ys.re.shape == oracle.ys.re.shape
    np.testing.assert_allclose(np.asarray(sol.ys.re),
                               np.asarray(oracle.ys.re), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sol.ys.im),
                               np.asarray(oracle.ys.im), atol=2e-6)


def test_packing_unitarity_and_no_cross_talk():
    # distinct initial states per trajectory: block-diagonality means no
    # cross-group mixing — each packed trajectory must evolve exactly as
    # its neighbors-free solve
    _, mod, _ = _lz_setup()
    B = 256
    rng = np.random.default_rng(7)
    psi = rng.standard_normal((B, 2)) + 1j * rng.standard_normal((B, 2))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi.astype(np.complex64), jnp.float32)
    ctl = vo.StepControl(rtol=1e-6, max_steps=2000)
    grid = jnp.asarray([-20.0, 20.0], jnp.float32)
    st = vexp.MidpointModulated(mod, interpret=True)
    sol = st.fused_loop_solve(y0, grid, 40.0 / 500, ctl=ctl,
                              adaptive=False)
    norms = np.sqrt((np.asarray(sol.y_final.re) ** 2
                     + np.asarray(sol.y_final.im) ** 2).sum(-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # per-trajectory results match the unpacked oracle lane-for-lane, so
    # no state leaks across the packed groups
    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MidpointModulated(mod, use_pallas=False),
        adaptive=False, h0=40.0 / 500, time_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(sol.y_final.re),
                               np.asarray(oracle.y_final.re),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(sol.y_final.im),
                               np.asarray(oracle.y_final.im),
                               atol=2e-5)


@pytest.mark.parametrize(
    "mutate",
    ["adaptive", "per_traj_h0", "bad_batch"],
)
def test_packing_eligibility_gates(mutate):
    _, mod, y0 = _lz_setup()
    ctl = vo.StepControl(rtol=1e-6, max_steps=2000)
    grid = jnp.asarray([-20.0, 20.0], jnp.float32)
    h0 = 40.0 / 500
    if mutate == "adaptive":
        st = vexp.MagnusModulated4(mod, adaptive=True, interpret=True)
        sol = st.fused_loop_solve(y0, grid, h0, ctl=ctl, adaptive=True)
    elif mutate == "per_traj_h0":
        st = vexp.MidpointModulated(mod, interpret=True)
        h = jnp.full((y0.re.shape[0],), h0, jnp.float32)
        sol = st.fused_loop_solve(y0, grid, h, ctl=ctl, adaptive=False)
    else:  # batch not a multiple of G=32
        st = vexp.MidpointModulated(mod, interpret=True)
        y0b = cp.Cplx(y0.re[:200], y0.im[:200])
        sol = st.fused_loop_solve(y0b, grid, h0, ctl=ctl, adaptive=False)
    assert sol is None  # falls back to the XLA driver
