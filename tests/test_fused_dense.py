"""Dense output ON the fused loop kernel (VERDICT r4 #4).

The persistent Pallas kernel integrates [t0, tf] free-running and records,
per interior save time, the RAW interpolation data of the step that crossed
it (entry/exit state + (t, dt) — ops/pallas_loop._make_loop_kernel
``dense_n``); the cubic Hermite is evaluated post-hoc in XLA with endpoint
slopes recomputed as A(t)x (exp/modulated._fused_dense_interp). Every test
pins the kernel (interpret mode) against the XLA dense tier
(dense.integrate_interp) running the same free-running controller.

Reference contract being beaten: the reference's only save mechanism
truncates steps onto t_list (ode.rs:165-176) — saves perturb the step
sequence AND the fused loop would be ineligible; here they do neither.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import dense as dn
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.events import Event, LinearObservable
from vec_ode_tpu.models import DrivenDense, LandauZener
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_solve
from vec_ode_tpu.utils.prec import HIGHEST

CTL = vo.StepControl(rtol=1e-5, max_steps=4000, min_dt=1e-5, max_dt=1.0)


def _dd_setup(B=8, d=16):
    dd = DrivenDense.make(d=d, seed=3)
    mod = dd.modulated(jnp.float32)
    rng = np.random.default_rng(0)
    psi = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
    psi /= np.linalg.norm(psi, axis=1, keepdims=True)
    return mod, cp.from_complex(psi.astype(np.complex64), jnp.float32)


def _lz_setup(B=256):
    mod = LandauZener(v=2.0, delta=0.4).modulated(jnp.float32)
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    return mod, cp.from_complex(psi0, jnp.float32)


def _xla_dense_ref(stepper, mod, y0, t_grid, h0, ctl, adaptive=True):
    """The XLA dense tier: integrate_interp with operator-slope Hermite —
    the exact math _fused_dense_interp must reproduce."""
    st = dataclasses.replace(stepper, use_pallas=False)
    step = st.make_step_fn()
    basis = mod.basis

    def slope(t, x):
        c = mod.coeff_fn(t)
        A = cp.Cplx(
            jnp.einsum("bk,kij->bij", c, basis.re, precision=HIGHEST),
            jnp.einsum("bk,kij->bij", c, basis.im, precision=HIGHEST),
        )
        return cp.cmatvec(A, x)

    def sfd(t, x, dt):
        xn, err = step(t, x, dt)
        return xn, err, (slope(t, x), slope(t + dt, xn))

    B = y0.re.shape[0]
    return dn.integrate_interp(
        sfd, y0, t_grid, h0, adaptive=adaptive, ctl=ctl,
        error_norm=lambda e: e, interp_kind="hermite", tab=None,
        batch_shape=(B,),
    )


def _assert_sol_close(sol, ref, rtol=2e-5, atol=3e-6, counter_tol=0):
    assert np.all(np.asarray(sol.status) == np.asarray(ref.status))
    cdiff = np.max(np.abs(np.asarray(sol.n_accept, np.int64)
                          - np.asarray(ref.n_accept, np.int64)))
    assert cdiff <= counter_tol, cdiff
    for part in ("re", "im"):
        a = np.asarray(getattr(sol.ys, part))
        b = np.asarray(getattr(ref.ys, part))
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


def test_fused_dense_unpacked_matches_xla_dense_tier():
    """DrivenDense d=16 (widened D=32 -> packed G=4? no: complex d=16 ->
    D=32, G=4) ... use d=64 to stay UNPACKED."""
    mod, y0 = _dd_setup(B=8, d=64)
    st = vexp.MagnusModulated4(mod, interpret=True)
    t_grid = jnp.linspace(0.0, 2.0, 8).astype(jnp.float32)
    sol = st.fused_loop_solve(y0, t_grid, jnp.float32(0.02), ctl=CTL,
                              adaptive=True, dense=True)
    assert sol is not None
    assert sol.path == "pallas-loop-persistent-dense"
    ref = _xla_dense_ref(st, mod, y0, t_grid, 0.02, CTL)
    _assert_sol_close(sol, ref)
    # free-running: identical step counts to a no-saves run of the kernel
    bare = st.fused_loop_solve(y0, t_grid[jnp.asarray([0, -1])],
                               jnp.float32(0.02), ctl=CTL, adaptive=True)
    np.testing.assert_array_equal(np.asarray(sol.n_accept),
                                  np.asarray(bare.n_accept))


def test_fused_dense_lane_packed_landau_zener():
    """LZ d=2 (D=4, G=32): packed rows record packed endpoints; the
    post-hoc Hermite unpacks them per trajectory. +-1 counter flips are the
    documented packed marginal-accept bound."""
    mod, y0 = _lz_setup(B=256)
    st = vexp.MagnusModulated4(mod, interpret=True)
    t_grid = jnp.linspace(-6.0, 6.0, 7).astype(jnp.float32)
    sol = st.fused_loop_solve(y0, t_grid, jnp.float32(0.01), ctl=CTL,
                              adaptive=True, dense=True)
    assert sol is not None
    assert sol.path == "pallas-loop-persistent-packed-dense"
    ref = _xla_dense_ref(st, mod, y0, t_grid, 0.01, CTL)
    _assert_sol_close(sol, ref, rtol=5e-4, atol=5e-5, counter_tol=1)


def test_fused_dense_cfm_and_midpoint():
    mod, y0 = _dd_setup(B=8, d=64)
    t_grid = jnp.linspace(0.0, 1.5, 6).astype(jnp.float32)
    st = vexp.CFM4Modulated(mod, interpret=True)
    sol = st.fused_loop_solve(y0, t_grid, jnp.float32(0.02), ctl=CTL,
                              adaptive=True, dense=True)
    assert sol is not None and sol.path.endswith("-dense")
    ref = _xla_dense_ref(st, mod, y0, t_grid, 0.02, CTL)
    _assert_sol_close(sol, ref)

    stm = vexp.MidpointModulated(mod, interpret=True)
    ctl_f = dataclasses.replace(CTL, max_dt=0.05)
    solm = stm.fused_loop_solve(y0, t_grid, jnp.float32(0.05), ctl=ctl_f,
                                adaptive=False, dense=True)
    assert solm is not None and solm.path.endswith("-dense")
    refm = _xla_dense_ref(stm, mod, y0, t_grid, 0.05, ctl_f, adaptive=False)
    _assert_sol_close(solm, refm)


def test_fused_dense_with_in_kernel_events():
    """Dense slots and event columns coexist in the same kernel launch."""
    mod, y0 = _dd_setup(B=8, d=64)
    st = vexp.MagnusModulated4(mod, interpret=True)
    t_grid = jnp.linspace(0.0, 2.0, 6).astype(jnp.float32)
    w = np.zeros(128, np.float32)
    w[0] = 1.0
    from vec_ode_tpu.events import EventConfig

    ev = EventConfig(events=(Event(LinearObservable(w=w, c=0.35),
                                   direction=0),))
    sol = st.fused_loop_solve(y0, t_grid, jnp.float32(0.02), ctl=CTL,
                              adaptive=True, dense=True, events=ev)
    assert sol is not None and sol.path.endswith("-dense")
    assert sol.event_t is not None
    ref = _xla_dense_ref(st, mod, y0, t_grid, 0.02, CTL)
    # events only LOCATE here (non-terminal), but the bracket search
    # perturbs the step sequence around each crossing — compare at solve
    # accuracy, not bitwise, against the event-free dense reference
    assert np.all(np.asarray(sol.status) == np.asarray(ref.status))
    for part in ("re", "im"):
        a = np.asarray(getattr(sol.ys, part))
        b = np.asarray(getattr(ref.ys, part))
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-4)


def test_fused_dense_eligibility_gates():
    mod, y0 = _dd_setup(B=8, d=64)
    st = vexp.MagnusModulated4(mod, interpret=True)
    # >16 interior times -> ineligible (VMEM endpoint-register budget)
    big = jnp.linspace(0.0, 2.0, 20).astype(jnp.float32)
    assert st.fused_loop_solve(y0, big, jnp.float32(0.02), ctl=CTL,
                               adaptive=True, dense=True) is None
    # chunked mode -> ineligible (endpoint registers would round-trip)
    g = jnp.linspace(0.0, 2.0, 5).astype(jnp.float32)
    assert st.fused_loop_solve(y0, g, jnp.float32(0.02), ctl=CTL,
                               adaptive=True, dense=True,
                               persistent=False) is None
    # bare [t0, tf]: dense is a no-op, plain persistent solve
    sol = st.fused_loop_solve(y0, g[jnp.asarray([0, -1])],
                              jnp.float32(0.02), ctl=CTL, adaptive=True,
                              dense=True)
    assert sol is not None and sol.path == "pallas-loop-persistent"


def test_ensemble_dense_routes_and_matches():
    """ensemble_solve(dense=True): fused when eligible, XLA dense tier
    otherwise — same numbers either way."""
    mod, y0 = _dd_setup(B=8, d=64)
    st = vexp.MagnusModulated4(mod, interpret=True)
    save = np.linspace(0.0, 2.0, 8)[1:-1]
    sol = ensemble_solve(None, y0, 0.0, 2.0, stepper=st, h0=0.02, ctl=CTL,
                         save_at=save, dense=True, time_dtype=jnp.float32)
    assert sol.path == "pallas-loop-persistent-dense"
    st2 = vexp.MagnusModulated4(mod, use_pallas=False)
    sol2 = ensemble_solve(None, y0, 0.0, 2.0, stepper=st2, h0=0.02, ctl=CTL,
                          save_at=save, dense=True, time_dtype=jnp.float32)
    assert sol2.path == "xla-driver-dense"
    assert sol.ts.shape == sol2.ts.shape
    _assert_sol_close(sol, sol2)


def test_ensemble_dense_vmapped_rk_matches_solve_ivp_dense():
    def f(t, y):
        return -y + 0.1 * jnp.sin(t) * y**2

    rng = np.random.default_rng(1)
    y0 = jnp.asarray(rng.standard_normal((4, 3)))
    save = np.linspace(0.0, 2.0, 5)[1:-1]
    sol = ensemble_solve(f, y0, 0.0, 2.0, stepper=vo.RungeKutta(), h0=0.05,
                         ctl=CTL, save_at=save, dense=True)
    ref = vo.solve_ivp_dense(f, 0.0, 2.0, y0[2], h0=0.05, ctl=CTL,
                             save_at=save)
    np.testing.assert_allclose(np.asarray(sol.ys[2]), np.asarray(ref.ys),
                               rtol=1e-12, atol=1e-14)


def test_ensemble_dense_events_requires_kernel():
    mod, y0 = _dd_setup(B=8, d=64)
    st = vexp.MagnusModulated4(mod, use_pallas=False)
    w = np.zeros(128, np.float32)
    w[0] = 1.0
    ev = (LinearObservable(w=w, c=0.35),)
    with pytest.raises(ValueError, match="dense=True with events"):
        ensemble_solve(None, y0, 0.0, 2.0, stepper=st, h0=0.02, ctl=CTL,
                       save_at=np.asarray([1.0]), dense=True, events=ev,
                       time_dtype=jnp.float32)


def test_fused_dense_rk_loop_matches_xla_dense_tier(monkeypatch):
    """The headline RK stepper (ops/pallas_rk.FusedModulatedLinearRK)
    records dense endpoints through its loop path too; Hermite slopes are
    f = (M0 + u(t) M1) x (hermite_slope)."""
    from vec_ode_tpu.dense import integrate_interp
    from vec_ode_tpu.ops import pallas_loop
    from vec_ode_tpu.ops.pallas_rk import FusedModulatedLinearRK

    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(41)
    B = 16
    z = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    y0 = cp.from_complex(z, jnp.float32)
    ctl = dataclasses.replace(CTL, rtol=1e-4)
    t_grid = jnp.linspace(0.0, 0.5, 7).astype(jnp.float32)
    st = FusedModulatedLinearRK.from_driven_dense(model, jnp.float32)
    orig_chunk = pallas_loop.fused_loop_chunk

    def chunk_interp(*args, **kw):
        kw["interpret"] = True
        kw["tile"] = 8
        return orig_chunk(*args, **kw)

    monkeypatch.setattr(pallas_loop, "fused_loop_chunk", chunk_interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    sol = st.fused_loop_solve(y0, t_grid, 1e-2, ctl=ctl, adaptive=True,
                              dense=True)
    assert sol is not None, "fused RK loop did not engage with dense="
    assert sol.path == "pallas-loop-persistent-dense"

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    fn = st.make_step_fn()

    def sfd(t, x, dt):
        xn, err = fn(t, x, dt)
        return xn, err, (st.hermite_slope(t, x),
                         st.hermite_slope(t + dt, xn))

    ref = integrate_interp(
        sfd, y0, t_grid, 1e-2, adaptive=True, ctl=ctl,
        error_norm=st.error_norm, interp_kind="hermite", tab=None,
        batch_shape=(B,),
    )
    _assert_sol_close(sol, ref)


def test_ensemble_dense_rk_fallback_uses_hermite_slope():
    """ensemble_solve(dense=True) with the batched RK stepper off-kernel
    lands on the XLA dense tier through hermite_slope (no ModulatedOperator
    needed) and matches the per-trajectory dense.py driver."""
    from vec_ode_tpu.ops.pallas_rk import FusedModulatedLinearRK

    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(5)
    B = 4
    z = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    y0 = cp.from_complex(z, jnp.float32)
    st = FusedModulatedLinearRK.from_driven_dense(model, jnp.float32)
    save = np.linspace(0.0, 0.5, 5)[1:-1]
    sol = ensemble_solve(None, y0, 0.0, 0.5, stepper=st, h0=1e-2, ctl=CTL,
                         save_at=save, dense=True, time_dtype=jnp.float32)
    assert sol.path == "xla-driver-dense"
    # per-trajectory twin through the generic linear dense driver
    mod = model.modulated(jnp.float32)
    ref = ensemble_solve(None, y0, 0.0, 0.5,
                         stepper=vexp.MagnusModulated4(mod,
                                                       use_pallas=False),
                         h0=1e-2, ctl=CTL, save_at=save, dense=True,
                         time_dtype=jnp.float32)
    # different steppers (RKF45 vs Magnus-4): compare at solve accuracy
    for part in ("re", "im"):
        a = np.asarray(getattr(sol.ys, part))
        b = np.asarray(getattr(ref.ys, part))
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)


def test_fused_dense_unreached_slots_are_zero():
    """Lanes that die (max_steps) leave later dense slots zeroed — the XLA
    dense driver's never-crossed convention, both tiers."""
    mod, y0 = _dd_setup(B=8, d=64)
    st = vexp.MagnusModulated4(mod, interpret=True)
    ctl = dataclasses.replace(CTL, max_steps=6, max_dt=0.05)
    t_grid = jnp.linspace(0.0, 2.0, 6).astype(jnp.float32)
    sol = st.fused_loop_solve(y0, t_grid, jnp.float32(0.05), ctl=ctl,
                              adaptive=True, dense=True)
    ref = _xla_dense_ref(st, mod, y0, t_grid, 0.05, ctl)
    assert np.all(np.asarray(sol.status) == vo.ERR_MAX_STEPS)
    _assert_sol_close(sol, ref)
    # the last slots really are zeros (never crossed in 6 steps of <=0.05)
    assert np.all(np.asarray(sol.ys.re)[:, -1] == 0.0)
