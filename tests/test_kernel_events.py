"""IN-KERNEL event detection for the fused/packed loop (VERDICT r3 #2).

Declared observables (events.LinearObservable / QuadraticObservable)
evaluate inside ops/pallas_loop.py's persistent kernel with the exact
regula-falsi-as-step-control semantics of events.event_step; every test
pins the kernel (interpret mode) against the XLA driver running the SAME
EventConfig through the callable path (the observables are callables too).

Reference contract: this generalizes the reference's only mid-run control,
the checkpoint grid (ode.rs:165-176), to state-dependent stopping times.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.events import (Event, EventConfig, LinearObservable,
                                QuadraticObservable)
from vec_ode_tpu.models import DrivenDense, LandauZener
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_solve


def _lz_setup(B=256):
    lz = LandauZener(v=2.0, delta=0.4)
    mod = lz.modulated(jnp.float32)
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    return mod, cp.from_complex(psi0, jnp.float32)


def _run_fused(stepper, y0, grid, ctl, ev, adaptive=True):
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        return stepper.fused_loop_solve(y0, grid, 1e-2, ctl=ctl,
                                        adaptive=adaptive, events=ev)
    finally:
        jax.default_backend = orig


CTL = vo.StepControl(rtol=1e-5, max_steps=4000, min_dt=1e-4, max_dt=1.0)
GRID = jnp.asarray([-20.0, 20.0], jnp.float32)


def _oracle(mod, y0, ev, ctl=CTL, stepper=None):
    return ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=stepper or vexp.MagnusModulated4(mod, use_pallas=False),
        adaptive=True, h0=1e-2, ctl=ctl, time_dtype=jnp.float32,
        events=ev,
    )


def test_observables_are_callables():
    """The declared forms ARE the XLA-tier event functions: values match a
    hand computation on both real and complex-pair states."""
    rng = np.random.default_rng(0)
    z = rng.standard_normal(4) + 1j * rng.standard_normal(4)
    x = cp.from_complex(z, jnp.float64)
    q = np.asarray([0.5, 1.0, 0.0, 2.0])
    g = float(QuadraticObservable(q=q, c=0.3)(0.0, x))
    np.testing.assert_allclose(g, (q * np.abs(z) ** 2).sum() - 0.3,
                               rtol=1e-12)
    w = rng.standard_normal(8)
    gl = float(LinearObservable(w=w, c=-1.0)(0.0, x))
    np.testing.assert_allclose(
        gl, (w[:4] * z.real).sum() + (w[4:] * z.imag).sum() + 1.0,
        rtol=1e-12)
    xr = jnp.asarray(rng.standard_normal(5))
    w5 = rng.standard_normal(5)
    np.testing.assert_allclose(
        float(LinearObservable(w=w5)(0.0, xr)), (w5 * np.asarray(xr)).sum(),
        rtol=1e-12)


def test_packed_terminal_event_matches_xla_driver():
    """The VERDICT #2 pin: the packed LZ config KEEPS
    path=pallas-loop-persistent-packed with events=, terminates each
    trajectory at its population threshold, and matches the XLA driver's
    event times to t_tol."""
    mod, y0 = _lz_setup()
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is not None
    assert sol.path == "pallas-loop-persistent-packed"
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()

    oracle = _oracle(mod, y0, ev)
    assert (np.asarray(oracle.status) == vo.DONE_EVENT).all()
    np.testing.assert_array_equal(np.asarray(sol.event_found),
                                  np.asarray(oracle.event_found))
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(oracle.event_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol.event_y.re),
                               np.asarray(oracle.event_y.re), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sol.n_accept),
                                  np.asarray(oracle.n_accept))
    np.testing.assert_array_equal(np.asarray(sol.n_reject),
                                  np.asarray(oracle.n_reject))


def test_packed_nonterminal_event_records_and_continues():
    """Non-terminal: the first crossing is recorded, the solve runs to tf
    (status DONE) — counters and the final state keep matching the XLA
    driver (the located step is ACCEPTED, so the trajectory is identical
    modulo the tight located step)."""
    mod, y0 = _lz_setup()
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1),), t_tol=1e-4)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is not None and sol.path.endswith("-packed")
    assert (np.asarray(sol.status) == vo.DONE).all()
    assert np.asarray(sol.event_found).all()

    oracle = _oracle(mod, y0, ev)
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(oracle.event_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol.y_final.re),
                               np.asarray(oracle.y_final.re),
                               rtol=2e-4, atol=2e-4)
    a_f = np.asarray(sol.n_accept)
    a_x = np.asarray(oracle.n_accept)
    assert (a_f == a_x).mean() > 0.8


def test_packed_two_events_directions():
    """Two observables with opposite directions locate independently; the
    falling-crossing event on pop0 and the rising on pop1 are the same
    physical time here (pop0 + pop1 = 1), cross-checking the bracket."""
    mod, y0 = _lz_setup()
    up = QuadraticObservable(q=[0.0, 1.0], c=0.05)     # pop1 rising
    down = QuadraticObservable(q=[1.0, 0.0], c=0.95)   # pop0 falling
    ev = EventConfig(
        events=(Event(up, direction=1), Event(down, direction=-1)),
        t_tol=1e-4,
    )
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is not None and sol.path.endswith("-packed")
    tf = np.asarray(sol.event_t)
    assert np.asarray(sol.event_found).all()
    np.testing.assert_allclose(tf[:, 0], tf[:, 1], atol=2e-4)
    oracle = _oracle(mod, y0, ev)
    np.testing.assert_allclose(tf, np.asarray(oracle.event_t), atol=1e-4)


def test_unpacked_linear_event_matches_xla_driver():
    """d=64 complex (G=1, no packing): a LinearObservable over the widened
    [re | im] layout runs in-kernel and matches the XLA driver."""
    model = DrivenDense.make(d=64, seed=0)
    mod = model.modulated(jnp.float32)
    rng = np.random.default_rng(21)
    B = 16
    z = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    y0 = cp.from_complex(z, jnp.float32)
    w = np.zeros(128)
    w[3] = 1.0   # Re z_3 crossing zero
    ev = EventConfig(events=(Event(LinearObservable(w=w)),), t_tol=1e-5)
    from vec_ode_tpu.driver import make_grid

    grid = make_grid(jnp.float32(0.0), jnp.float32(0.5), dtype=jnp.float32)
    ctl = vo.StepControl(rtol=1e-4, min_dt=1e-6, max_dt=0.2, max_steps=2000)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, grid, ctl, ev)
    assert sol is not None and sol.path == "pallas-loop-persistent"

    from vec_ode_tpu.driver import integrate

    st_x = vexp.MagnusModulated4(mod, use_pallas=False)
    sol_x = integrate(
        st_x.make_step_fn(), y0, grid, 1e-2, adaptive=True, ctl=ctl,
        error_norm=st_x.error_norm, batch_shape=(B,), event_cfg=ev,
    )
    f_f, f_x = np.asarray(sol.event_found), np.asarray(sol_x.event_found)
    np.testing.assert_array_equal(f_f, f_x)
    m = f_f[:, 0]
    assert m.any()
    np.testing.assert_allclose(np.asarray(sol.event_t)[m],
                               np.asarray(sol_x.event_t)[m], atol=1e-5)


def test_chunked_mode_event_state_round_trips():
    """persistent=False: found/searching bits and the g_prev/t_ev columns
    survive the XLA loop-carry round trip between kernel launches."""
    mod, y0 = _lz_setup(B=256)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4)
    st = vexp.MagnusModulated4(mod, interpret=True)
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        sol = st.fused_loop_solve(y0, GRID, 1e-2, ctl=CTL, adaptive=True,
                                  events=ev, persistent=False)
    finally:
        jax.default_backend = orig
    assert sol is not None and sol.path.startswith("pallas-loop-chunked")
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()
    oracle = _oracle(mod, y0, ev)
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(oracle.event_t), atol=1e-4)


def test_record_y_false_skips_state_buffers():
    mod, y0 = _lz_setup(B=256)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4, record_y=False)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is not None
    assert sol.event_y is None
    assert np.asarray(sol.event_found).all()


def test_opaque_callable_falls_back_to_xla_driver():
    """A plain-python event fn cannot run in-kernel: fused_loop_solve
    declines and ensemble_solve's XLA driver handles it (with identical
    event semantics)."""
    mod, y0 = _lz_setup(B=256)
    fn = lambda t, x: x.re[1] ** 2 + x.im[1] ** 2 - 0.05
    ev = EventConfig(events=(Event(fn, direction=1, terminal=True),),
                     t_tol=1e-4)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is None
    # end-to-end: dispatcher falls back and still terminates on the event
    sol2 = _oracle(mod, y0, ev, stepper=vexp.MagnusModulated4(
        mod, interpret=True))
    assert (np.asarray(sol2.status) == vo.DONE_EVENT).all()


def test_ensemble_dispatch_keeps_fused_path_with_observables():
    """ensemble_solve(events=declared observables) engages the fused loop
    (the r3 behavior was an unconditional fallback warning)."""
    mod, y0 = _lz_setup()
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4)
    sol = _oracle(mod, y0, ev,
                  stepper=vexp.MagnusModulated4(mod, interpret=True))
    assert sol.path == "pallas-loop-persistent-packed"
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()


def test_search_iterations_do_not_pollute_reject_stats():
    """Bracket-search iterations are not numerical rejections: with a
    permissive tolerance the event search must not increment n_reject
    (mirrors events.py's true_reject discipline)."""
    mod, y0 = _lz_setup(B=256)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-6)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is not None
    assert (np.asarray(sol.n_reject) == 0).all()
    # and the search DID happen: locating to 1e-6 from h~0.1 needs > 10
    # extra iterations beyond the accepted steps
    assert (np.asarray(sol.n_iters)
            > np.asarray(sol.n_accept) + 5).all()


def test_rk_loop_event_matches_xla_driver(monkeypatch):
    """The headline RK stepper (ops/pallas_rk.FusedModulatedLinearRK)
    carries the same in-kernel event machinery through its loop path."""
    from vec_ode_tpu.driver import integrate, make_grid
    from vec_ode_tpu.ops import pallas_loop
    from vec_ode_tpu.ops.pallas_rk import FusedModulatedLinearRK

    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(41)
    B = 16
    z = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    y0 = cp.from_complex(z, jnp.float32)
    ctl = vo.StepControl(rtol=1e-4, min_dt=1e-6, max_dt=0.25,
                         max_steps=2000)
    t_grid = make_grid(jnp.float32(0), jnp.float32(0.5),
                       dtype=jnp.float32)
    w = np.zeros(128)
    w[3] = 1.0   # Re z_3 crossing zero (widened [re | im] layout)
    ev = EventConfig(events=(Event(LinearObservable(w=w)),), t_tol=1e-5)
    st = FusedModulatedLinearRK.from_driven_dense(model, jnp.float32)
    orig_chunk = pallas_loop.fused_loop_chunk

    def chunk_interp(*args, **kw):
        kw["interpret"] = True
        kw["tile"] = 8
        return orig_chunk(*args, **kw)

    monkeypatch.setattr(pallas_loop, "fused_loop_chunk", chunk_interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    sol_f = st.fused_loop_solve(y0, t_grid, 1e-2, ctl=ctl, adaptive=True,
                                events=ev)
    assert sol_f is not None, "fused RK loop did not engage with events"

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    sol_x = integrate(
        st.make_step_fn(), y0, t_grid, 1e-2, adaptive=True, ctl=ctl,
        error_norm=st.error_norm, batch_shape=(B,), event_cfg=ev,
    )
    f_f = np.asarray(sol_f.event_found)
    np.testing.assert_array_equal(f_f, np.asarray(sol_x.event_found))
    m = f_f[:, 0]
    assert m.any()
    np.testing.assert_allclose(np.asarray(sol_f.event_t)[m],
                               np.asarray(sol_x.event_t)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol_f.event_y.re)[m],
                               np.asarray(sol_x.event_y.re)[m],
                               atol=1e-4)


def test_blackbox_auto_modulated_events_stay_packed():
    """The reference's OPAQUE operator contract (magnus.rs:32) routed
    through exp.auto_modulated keeps in-kernel events too: structure
    recovery + Chebyshev coefficient fit give the black box a kernel
    view, so a declared terminal event stays on the packed loop."""
    lz = LandauZener(v=2.0, delta=0.4)
    mod = vexp.auto_modulated(
        lambda t: lz.op_pair(t, jnp.float32), -20.0, 20.0,
        dtype=jnp.float32)
    assert mod is not None and mod.coeff_cols_fn is not None
    B = 256
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is not None
    assert sol.path == "pallas-loop-persistent-packed"
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()
    # event time matches the hand-declared modulated operator's run
    mod_h = lz.modulated(jnp.float32)
    sol_h = _run_fused(vexp.MagnusModulated4(mod_h, interpret=True),
                       y0, GRID, CTL, ev)
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(sol_h.event_t), atol=2e-4)


def test_fixed_step_kernel_events():
    """adaptive=False: the event veto/search discipline rides the fixed
    stepper too (accept is unconditionally true outside searches), matching
    the XLA driver."""
    mod, y0 = _lz_setup(B=256)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4)
    ctl = vo.StepControl(rtol=1e-6, max_steps=4000)
    st = vexp.MagnusModulated4(mod, adaptive=False, interpret=True)
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        sol = st.fused_loop_solve(y0, GRID, 40.0 / 800, ctl=ctl,
                                  adaptive=False, events=ev)
    finally:
        jax.default_backend = orig
    assert sol is not None and sol.path.endswith("-packed")
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()

    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MagnusModulated4(mod, adaptive=False,
                                      use_pallas=False),
        adaptive=False, h0=40.0 / 800, ctl=ctl, time_dtype=jnp.float32,
        events=ev,
    )
    assert (np.asarray(oracle.status) == vo.DONE_EVENT).all()
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(oracle.event_t), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sol.n_accept),
                                  np.asarray(oracle.n_accept))


def test_events_with_interior_saves():
    """Non-terminal in-kernel event + interior save grid: located times
    AND the recorded save states both match the XLA driver."""
    mod, y0 = _lz_setup(B=256)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1),), t_tol=1e-4)
    grid = jnp.asarray([-20.0, 0.0, 10.0, 20.0], jnp.float32)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, grid, CTL, ev)
    assert sol is not None and sol.path.endswith("-packed")
    assert (np.asarray(sol.status) == vo.DONE).all()

    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0, save_at=[0.0, 10.0],
        stepper=vexp.MagnusModulated4(mod, use_pallas=False),
        adaptive=True, h0=1e-2, ctl=CTL, time_dtype=jnp.float32,
        events=ev,
    )
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(oracle.event_t), atol=1e-4)
    # interior save slots (indices 1, 2) recorded in-kernel
    np.testing.assert_allclose(np.asarray(sol.ys.re)[:, 1:3],
                               np.asarray(oracle.ys.re)[:, 1:3],
                               rtol=2e-4, atol=2e-4)


def test_terminal_event_before_interior_save():
    """A terminal event located BEFORE an interior save time leaves that
    save slot at its zero initialization — identically on both paths."""
    mod, y0 = _lz_setup(B=256)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4)
    grid = jnp.asarray([-20.0, 10.0, 20.0], jnp.float32)  # event ~ t=0.33
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, grid, CTL, ev)
    assert sol is not None and sol.path.endswith("-packed")
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()
    assert (np.asarray(sol.ys.re)[:, 1] == 0).all()
    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0, save_at=[10.0],
        stepper=vexp.MagnusModulated4(mod, use_pallas=False),
        adaptive=True, h0=1e-2, ctl=CTL, time_dtype=jnp.float32,
        events=ev,
    )
    assert (np.asarray(oracle.status) == vo.DONE_EVENT).all()
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(oracle.event_t), atol=1e-4)


def test_events_and_weighted_norm_together():
    """Both r4 kernel features on ONE solve: a terminal declared event
    and a declared WeightedNorm, in-kernel, packed — vs the XLA driver."""
    from vec_ode_tpu import lc

    mod, y0 = _lz_setup(B=256)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4)
    wn = lc.WeightedNorm("l2", weights=np.asarray([2.0, 0.5], np.float32))
    st = vexp.MagnusModulated4(mod, interpret=True, norm=wn)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is not None and sol.path.endswith("-packed")
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()
    oracle = _oracle(mod, y0, ev,
                     stepper=vexp.MagnusModulated4(mod, use_pallas=False,
                                                   norm=wn))
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(oracle.event_t), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sol.n_accept),
                                  np.asarray(oracle.n_accept))


def test_cfm_modulated_kernel_events():
    """In-kernel events ride every chain stepper's loop path — CFM-4
    modulated (R=2 chains) with a terminal event, packed."""
    mod, y0 = _lz_setup(B=256)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4)
    st = vexp.CFM4Modulated(mod, interpret=True)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is not None and sol.path.endswith("-packed")
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()
    oracle = _oracle(mod, y0, ev,
                     stepper=vexp.CFM4Modulated(mod, use_pallas=False))
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(oracle.event_t), atol=1e-4)


def test_fast_error_kernel_events():
    """fast_error (C=1 + err action) composes with in-kernel events."""
    mod, y0 = _lz_setup(B=256)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                     t_tol=1e-4)
    st = vexp.MagnusModulated4(mod, interpret=True, fast_error=True)
    sol = _run_fused(st, y0, GRID, CTL, ev)
    assert sol is not None and sol.path.endswith("-packed")
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()
    oracle = _oracle(mod, y0, ev,
                     stepper=vexp.MagnusModulated4(mod, use_pallas=False,
                                                   fast_error=True))
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(oracle.event_t), atol=1e-4)
