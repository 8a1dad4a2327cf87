"""Lane-packed fused-loop integration for small widened dims (exp/
modulated.py:_fused_loop_run): D | 128 packs G = 128/D trajectories per
kernel row over a block-diagonal kron(I_G, M_k) basis — the reference's
bread-and-butter 2-level regime (BASELINE config 3, magnus.rs:10-26
semantics). Every per-trajectory scalar (t, h, status, error norm,
counters) lives in its own group COLUMN of the packed carry blocks
(ops/pallas_loop.py group mode), so fixed-step, adaptive control and
per-trajectory h0 all keep exact per-trajectory semantics.

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


def test_packing_eligibility_gate_bad_batch():
    # batch not a multiple of G=32 -> falls back to the XLA driver
    _, mod, y0 = _lz_setup()
    ctl = vo.StepControl(rtol=1e-6, max_steps=2000)
    grid = jnp.asarray([-20.0, 20.0], jnp.float32)
    st = vexp.MidpointModulated(mod, interpret=True)
    y0b = cp.Cplx(y0.re[:200], y0.im[:200])
    sol = st.fused_loop_solve(y0b, grid, 40.0 / 500, ctl=ctl,
                              adaptive=False)
    assert sol is None


def test_packed_adaptive_magnus4_matches_driver():
    """ADAPTIVE lane packing: every trajectory keeps its own (t, h,
    status, err) column in the packed carry blocks, so per-trajectory
    step-size control is exact — counters and accept/reject sequences
    must match the XLA driver trajectory-for-trajectory."""
    _, mod, y0 = _lz_setup()
    ctl = vo.StepControl(rtol=1e-5, max_steps=20000)
    grid = jnp.asarray([-20.0, 20.0], jnp.float32)
    st = vexp.MagnusModulated4(mod, adaptive=True, interpret=True)
    sol = st.fused_loop_solve(y0, grid, 0.05, ctl=ctl, adaptive=True)
    assert sol is not None and sol.path.endswith("-packed")
    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MagnusModulated4(mod, adaptive=True,
                                      use_pallas=False),
        ctl=ctl, h0=0.05, time_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(sol.status),
                                  np.asarray(oracle.status))
    # Controller arithmetic is bit-pinned (kernel uses jnp.power, whose
    # Mosaic lowering is bitwise-identical to XLA's — measured r5), but
    # the packed propagator/err come from the in-kernel streaming Taylor
    # chain while the oracle's come from Paterson-Stockmeyer expm
    # (ops/expm.py): two polynomial schemes for the same e^{dt*A}, each
    # chosen for its tier. Their ~1e-6-relative f32 disagreement flips
    # marginal accepts (f = rtol/err within an ulp of 1), shifting
    # counters by a step or two (same documented tolerance as
    # bench._parity_lane_packed). See test_packed_counter_bound_root_cause.
    assert np.abs(np.asarray(sol.n_accept)
                  - np.asarray(oracle.n_accept)).max() <= 2
    assert np.abs(np.asarray(sol.n_reject)
                  - np.asarray(oracle.n_reject)).max() <= 2
    for a, b in [(sol.y_final.re, oracle.y_final.re),
                 (sol.y_final.im, oracle.y_final.im)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)


def test_packed_adaptive_divergent_control_per_trajectory():
    """Heterogeneous difficulty across one packed row: random states make
    per-trajectory error estimates differ, so h sequences diverge WITHIN
    a lane group — counters must still match the driver exactly."""
    _, mod, _ = _lz_setup()
    B = 256
    rng = np.random.default_rng(3)
    psi = rng.standard_normal((B, 2)) + 1j * rng.standard_normal((B, 2))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi.astype(np.complex64), jnp.float32)
    ctl = vo.StepControl(rtol=1e-4, max_steps=20000)
    grid = jnp.asarray([-8.0, 8.0], jnp.float32)
    # per-trajectory h0 spread, SHUFFLED so every packed lane group
    # spans the whole range -> divergent control inside each row
    h0_np = np.geomspace(0.005, 0.5, B).astype(np.float32)
    rng.shuffle(h0_np)
    h0 = jnp.asarray(h0_np)
    st = vexp.MagnusModulated4(mod, adaptive=True, interpret=True)
    sol = st.fused_loop_solve(y0, grid, h0, ctl=ctl, adaptive=True)
    assert sol is not None and sol.path.endswith("-packed")
    oracle = ensemble_solve(
        mod, y0, -8.0, 8.0,
        stepper=vexp.MagnusModulated4(mod, adaptive=True,
                                      use_pallas=False),
        ctl=ctl, h0=h0, time_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(sol.status),
                                  np.asarray(oracle.status))
    # Streaming-Taylor vs Paterson-Stockmeyer expm rounding (see
    # test_packed_counter_bound_root_cause): marginal accepts may flip
    # on a few trajectories (same convention as test_modulated.py)
    a_k = np.asarray(sol.n_accept)
    a_x = np.asarray(oracle.n_accept)
    assert (a_k == a_x).mean() > 0.9, (a_k, a_x)
    assert np.abs(a_k - a_x).max() <= 2
    assert len(set((a_k + np.asarray(sol.n_reject))[:32].tolist())) > 1, \
        "expected divergent control within a lane group"
    for a, b in [(sol.y_final.re, oracle.y_final.re),
                 (sol.y_final.im, oracle.y_final.im)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_packed_nan_containment():
    """A trajectory with a NaN initial state must NOT poison its packed
    lane-group neighbors (make_chain_step_builder zeroes bad groups for
    the matmul chains and re-poisons them on exit)."""
    _, mod, y0 = _lz_setup()
    bad_re = y0.re.at[5, 0].set(jnp.nan)
    y0n = cp.Cplx(bad_re, y0.im)
    ctl = vo.StepControl(rtol=1e-6, max_steps=2000)
    grid = jnp.asarray([-20.0, 20.0], jnp.float32)
    st = vexp.MidpointModulated(mod, interpret=True)
    sol = st.fused_loop_solve(y0n, grid, 40.0 / 500, ctl=ctl,
                              adaptive=False)
    re = np.asarray(sol.y_final.re)
    im = np.asarray(sol.y_final.im)
    # the NaN trajectory stays NaN (sticky, as unpacked)
    assert np.isnan(re[5]).all()
    # every OTHER trajectory in its group (0..31) is clean and correct
    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MidpointModulated(mod, use_pallas=False),
        adaptive=False, h0=40.0 / 500, time_dtype=jnp.float32,
    )
    keep = np.ones(256, bool)
    keep[5] = False
    assert np.isfinite(re[keep]).all() and np.isfinite(im[keep]).all()
    np.testing.assert_allclose(re[keep],
                               np.asarray(oracle.y_final.re)[keep],
                               atol=2e-5)


def test_packed_adaptive_nan_trajectory_stalls_alone():
    """Adaptive: the NaN trajectory permanently rejects and stalls
    (ERR_STALLED), neighbors finish DONE — the unpacked driver's
    semantics, per trajectory."""
    _, mod, y0 = _lz_setup()
    bad_re = y0.re.at[5, 0].set(jnp.nan)
    y0n = cp.Cplx(bad_re, y0.im)
    ctl = vo.StepControl(rtol=1e-5, max_steps=4000, max_reject_streak=50)
    grid = jnp.asarray([-8.0, 8.0], jnp.float32)
    st = vexp.MagnusModulated4(mod, adaptive=True, interpret=True)
    sol = st.fused_loop_solve(y0n, grid, 0.05, ctl=ctl, adaptive=True)
    status = np.asarray(sol.status)
    assert status[5] == vo.ERR_STALLED, status[5]
    keep = np.ones(256, bool)
    keep[5] = False
    assert (status[keep] == vo.DONE).all()


def test_packed_rk_loop_matches_xla_stepper(monkeypatch):
    """Lane packing on the RK family (ops/pallas_rk.fused_loop_solve):
    a d=2 modulated-linear system (Dw=4, G=32) runs the whole adaptive
    RKF45 loop in one packed persistent kernel; oracle = the same
    stepper's XLA step under the generic driver."""
    from vec_ode_tpu.driver import integrate, make_grid
    from vec_ode_tpu.ops import pallas_loop
    from vec_ode_tpu.ops.pallas_rk import FusedModulatedLinearRK

    # driven qubit: H(t) = 0.5*sz*t-free part + cos(t) * 0.4*sx
    sz = np.asarray([[0.5, 0.0], [0.0, -0.5]], np.float32)
    sx = np.asarray([[0.0, 0.5], [0.5, 0.0]], np.float32)

    def embed_np(re, im):
        return np.block([[re, -im], [im, re]])

    M0 = embed_np(np.zeros_like(sz), -sz)   # -i*sz
    M1 = embed_np(np.zeros_like(sx), -0.8 * sx)
    B = 256
    rng = np.random.default_rng(5)
    psi = rng.standard_normal((B, 2)) + 1j * rng.standard_normal((B, 2))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi.astype(np.complex64), jnp.float32)
    ctl = vo.StepControl(rtol=1e-4, min_dt=1e-6, max_dt=0.25,
                         max_steps=2000)
    t_grid = make_grid(jnp.float32(0), jnp.float32(2.0),
                       dtype=jnp.float32)
    st = FusedModulatedLinearRK(M0=M0, M1=M1,
                                u_fn=lambda t: jnp.cos(t))

    orig_chunk = pallas_loop.fused_loop_chunk

    def chunk_interp(*args, **kw):
        kw["interpret"] = True
        return orig_chunk(*args, **kw)

    monkeypatch.setattr(pallas_loop, "fused_loop_chunk", chunk_interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    sol_f = st.fused_loop_solve(y0, t_grid, 1e-2, ctl=ctl, adaptive=True)
    assert sol_f is not None, "packed RK loop did not engage"
    assert sol_f.path.endswith("-packed"), sol_f.path
    assert (np.asarray(sol_f.status) == vo.DONE).all()

    st_x = FusedModulatedLinearRK(M0=M0, M1=M1,
                                  u_fn=lambda t: jnp.cos(t),
                                  use_pallas=False)
    sol_x = integrate(
        st_x.make_step_fn(), y0, t_grid, 1e-2, adaptive=True, ctl=ctl,
        error_norm=st_x.error_norm, batch_shape=(B,),
    )
    a_f, a_x = np.asarray(sol_f.n_accept), np.asarray(sol_x.n_accept)
    assert (a_f == a_x).mean() > 0.8, (a_f, a_x)
    np.testing.assert_allclose(np.asarray(sol_f.y_final.re),
                               np.asarray(sol_x.y_final.re),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sol_f.y_final.im),
                               np.asarray(sol_x.y_final.im),
                               rtol=2e-4, atol=2e-4)


def test_packed_cfm4_adaptive_matches_driver():
    """The CFM modulated family packs through the same _fused_loop_run
    path (exp/modulated.py:CFMModulated.fused_loop_solve)."""
    _, mod, y0 = _lz_setup()
    ctl = vo.StepControl(rtol=1e-5, max_steps=20000)
    grid = jnp.asarray([-8.0, 8.0], jnp.float32)
    st = vexp.CFM4Modulated(mod, interpret=True)
    sol = st.fused_loop_solve(y0, grid, 0.05, ctl=ctl, adaptive=True)
    assert sol is not None and sol.path.endswith("-packed"), (
        None if sol is None else sol.path)
    oracle = ensemble_solve(
        mod, y0, -8.0, 8.0,
        stepper=vexp.CFM4Modulated(mod, use_pallas=False),
        ctl=ctl, h0=0.05, time_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(sol.status),
                                  np.asarray(oracle.status))
    a_k, a_x = np.asarray(sol.n_accept), np.asarray(oracle.n_accept)
    assert (a_k == a_x).mean() > 0.8 and np.abs(a_k - a_x).max() <= 2
    for a, b in [(sol.y_final.re, oracle.y_final.re),
                 (sol.y_final.im, oracle.y_final.im)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_packed_adjoint_sweeps_match_xla(monkeypatch):
    """Lane-packed adjoint sweep kernels (diff.py:_adjoint_core): a d=2
    control problem (D=4, G=32) runs both whole-sweep kernels on packed
    rows over the kron(I_G, W_k) basis; gradients must match the
    use_pallas=False XLA scan path."""
    from vec_ode_tpu import diff
    from vec_ode_tpu.ops import pallas_expmv

    sx = jnp.asarray([[0.0, 1.0], [1.0, 0.0]], jnp.float32)
    sz = jnp.asarray([[1.0, 0.0], [0.0, -1.0]], jnp.float32)
    basis = cp.Cplx(jnp.zeros((2, 2, 2), jnp.float32),
                    -jnp.stack([sx, sz]))

    def coeff_fn(t, th):
        t = jnp.asarray(t)
        return jnp.stack(
            [jnp.ones_like(t), th[0] * jnp.cos(th[1] * t)], axis=-1)

    B = 256
    rng = np.random.default_rng(11)
    psi = rng.standard_normal((B, 2)) + 1j * rng.standard_normal((B, 2))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi.astype(np.complex64), jnp.float32)
    theta = jnp.asarray([0.6, 1.3], jnp.float32)

    fwd_orig = pallas_expmv.adjoint_sweep_fwd_pallas
    bwd_orig = pallas_expmv.adjoint_sweep_bwd_pallas
    hits = {"fwd": 0, "bwd": 0}

    def fwd_i(*a, **kw):
        hits["fwd"] += 1
        kw["interpret"] = True
        return fwd_orig(*a, **kw)

    def bwd_i(*a, **kw):
        hits["bwd"] += 1
        kw["interpret"] = True
        return bwd_orig(*a, **kw)

    monkeypatch.setattr(pallas_expmv, "adjoint_sweep_fwd_pallas", fwd_i)
    monkeypatch.setattr(pallas_expmv, "adjoint_sweep_bwd_pallas", bwd_i)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def loss(th, use_pallas):
        yf = diff.adjoint_solve(basis, coeff_fn, th, y0, 0.0, 1.5, 24,
                                order=4, use_pallas=use_pallas)
        return jnp.sum(yf.re ** 2 + yf.re * yf.im)

    v_k, g_k = jax.value_and_grad(lambda th: loss(th, True))(theta)
    assert hits["fwd"] > 0 and hits["bwd"] > 0, hits  # packed kernels ran
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    v_x, g_x = jax.value_and_grad(lambda th: loss(th, False))(theta)
    np.testing.assert_allclose(float(v_k), float(v_x), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=2e-4, atol=2e-6)


def test_packed_adaptive_interior_saves():
    """Interior save_at grid hits recorded in-kernel on the packed path
    under ADAPTIVE control (per-group tgt columns)."""
    _, mod, y0 = _lz_setup()
    ctl = vo.StepControl(rtol=1e-5, max_steps=20000)
    grid = jnp.asarray([-8.0, -2.0, 3.0, 8.0], jnp.float32)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = st.fused_loop_solve(y0, grid, 0.05, ctl=ctl, adaptive=True)
    assert sol is not None and sol.path.endswith("-packed")
    oracle = ensemble_solve(
        mod, y0, -8.0, 8.0,
        stepper=vexp.MagnusModulated4(mod, use_pallas=False),
        ctl=ctl, h0=0.05, time_dtype=jnp.float32,
        save_at=grid[1:-1],
    )
    assert sol.ys.re.shape == oracle.ys.re.shape
    np.testing.assert_allclose(np.asarray(sol.ys.re),
                               np.asarray(oracle.ys.re), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol.ys.im),
                               np.asarray(oracle.ys.im), atol=1e-4)


def test_packed_magnus6_adaptive():
    """Magnus-6 packs too: the R=3 Yoshida sub-row structure runs
    per-group in the packed kernel (C=2 chains, 3 rows each)."""
    _, mod, y0 = _lz_setup()
    ctl = vo.StepControl(rtol=1e-6, max_steps=20000, order=7)
    grid = jnp.asarray([-8.0, 8.0], jnp.float32)
    st = vexp.MagnusModulated6(mod, interpret=True)
    sol = st.fused_loop_solve(y0, grid, 0.05, ctl=ctl, adaptive=True)
    assert sol is not None and sol.path.endswith("-packed")
    oracle = ensemble_solve(
        mod, y0, -8.0, 8.0,
        stepper=vexp.MagnusModulated6(mod, use_pallas=False),
        ctl=ctl, h0=0.05, time_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(sol.status),
                                  np.asarray(oracle.status))
    a_k, a_x = np.asarray(sol.n_accept), np.asarray(oracle.n_accept)
    # identical trajectories flip marginal accepts all-or-nothing here
    # (the packed error norm reduces in a different summation order):
    # bound the magnitude, not the agreement fraction
    assert np.abs(a_k - a_x).max() <= 2, (a_k[:4], a_x[:4])
    for a, b in [(sol.y_final.re, oracle.y_final.re),
                 (sol.y_final.im, oracle.y_final.im)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_packed_counter_bound_root_cause():
    """Regression test for the documented ±1 adaptive-counter bound
    (PARITY_DEVICE.json lane_packed; VERDICT r4 #6) and its r5
    root-cause decomposition. Three divergence sources were isolated:

    1. Controller f^p arithmetic — FIXED bitwise in r5: the kernel now
       uses ``jnp.power`` with the exact expression tree of
       ``controller.controller_update`` (Mosaic's pow lowering measured
       bitwise-identical to XLA's on v5e, 0/8192 bits; the old
       exp(log(f)*p) form diverged in ~50% of entries by up to ~300 ulp).
    2. Packed error-norm reduction (one-hot HIGHEST matmul vs f32 VPU
       sum) — ~1 ulp in ~15% of entries; measured NOT dominant (swapping
       in the bitwise-exact ``pallas_loop._segment_sum_cols`` did not
       close the flips and cost 2.4× throughput, so the matmul stays).
    3. The propagator itself — IRREDUCIBLE by design: the packed kernel
       evaluates e^{dt·A} by a streaming Taylor chain with tile-max
       squaring (pallas_loop.make_chain_step_builder) while the XLA tier
       uses Paterson-Stockmeyer (ops/expm.py); two polynomial schemes,
       each chosen for its hardware tier, disagreeing at ~1e-6 relative
       in y AND err. With f = rtol/err sitting within an ulp of 1 on a
       marginal step, that flips the accept — regardless of norm or
       controller arithmetic.

    The test pins both halves: (a) fixed-step (identical step sequence,
    control out of the loop) packed vs XLA output differs — nonzero —
    but stays inside the documented band, proving the residual source
    is upstream of control; (b) adaptive counters stay within the
    documented bound."""
    _, mod, y0 = _lz_setup()
    grid = jnp.asarray([-20.0, 20.0], jnp.float32)
    ctl = vo.StepControl(rtol=1e-6, max_steps=2000)
    # (a) fixed step: same h sequence on both tiers by construction
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
    d = max(
        np.abs(np.asarray(sol.y_final.re)
               - np.asarray(oracle.y_final.re)).max(),
        np.abs(np.asarray(sol.y_final.im)
               - np.asarray(oracle.y_final.im)).max(),
    )
    assert d > 0.0, \
        "tiers became bitwise-identical: tighten the counter bound to 0"
    assert d < 1e-5, f"fixed-step tier divergence grew: {d:g}"
    # (b) adaptive: counters within the documented bound
    st_a = vexp.MagnusModulated4(mod, adaptive=True, interpret=True)
    sol_a = st_a.fused_loop_solve(y0, grid, 0.05, ctl=ctl, adaptive=True)
    assert sol_a is not None and sol_a.path.endswith("-packed")
    oracle_a = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MagnusModulated4(mod, adaptive=True,
                                      use_pallas=False),
        ctl=ctl, h0=0.05, time_dtype=jnp.float32,
    )
    assert np.abs(np.asarray(sol_a.n_accept)
                  - np.asarray(oracle_a.n_accept)).max() <= 2
    assert np.abs(np.asarray(sol_a.n_reject)
                  - np.asarray(oracle_a.n_reject)).max() <= 2
