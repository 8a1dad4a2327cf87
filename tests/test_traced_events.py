"""Traced event callables run IN-KERNEL on the fused loop (VERDICT r4 #3,
events half).

A declared observable (LinearObservable/QuadraticObservable) always ran
in-kernel; an opaque callable used to force the XLA driver. Now
events._kernel_spec probes the callable with jax.eval_shape on a
per-trajectory (t, state) abstract and, when it traces to a scalar,
executes it inside the kernel by vmapping over the (TILE, D) tile rows
("traced" events). Untraceable callables and lane-packed configs keep the
XLA-driver fallback (Mosaic cannot unpack a packed row without a 3-D
reshape).
"""

import jax
import jax.numpy as jnp
import numpy as np

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.driver import integrate, make_grid
from vec_ode_tpu.events import (Event, EventConfig, LinearObservable,
                                QuadraticObservable, _kernel_spec)
from vec_ode_tpu.models import DrivenDense, LandauZener
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_solve


def _driven64(B=16, seed=21):
    model = DrivenDense.make(d=64, seed=0)
    mod = model.modulated(jnp.float32)
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    return mod, cp.from_complex(z, jnp.float32)


def _run_fused(stepper, y0, grid, ctl, ev, adaptive=True):
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        return stepper.fused_loop_solve(y0, grid, 1e-2, ctl=ctl,
                                        adaptive=adaptive, events=ev)
    finally:
        jax.default_backend = orig


CTL64 = vo.StepControl(rtol=1e-4, min_dt=1e-6, max_dt=0.2, max_steps=2000)


# ------------------------------------------------------------- spec --


def test_kernel_spec_traces_plain_jnp_callable():
    fn = lambda t, x: x.re[3] - 0.1 * t
    spec = _kernel_spec(
        EventConfig(events=(Event(fn),)), 64, 2, dtype=jnp.float32)
    assert spec is not None and spec.kinds == ("traced",)
    assert spec.any_traced
    # the block evaluator reproduces the callable row-wise
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    t = jnp.full((8, 1), 0.5, jnp.float32)
    got = np.asarray(spec.traced[0](t, y))
    want = np.asarray(y)[:, 3] - 0.05
    np.testing.assert_allclose(got[:, 0], want, rtol=1e-6)


def test_kernel_spec_rejects_untraceable():
    fn = lambda t, x: float(np.asarray(x.re).max())  # concretizes
    spec = _kernel_spec(
        EventConfig(events=(Event(fn),)), 64, 2, dtype=jnp.float32)
    assert spec is None


def test_kernel_spec_mixes_declared_and_traced():
    w = np.zeros(128)
    w[3] = 1.0
    fn = lambda t, x: jnp.sum(x.re ** 2 + x.im ** 2) - 0.5
    spec = _kernel_spec(
        EventConfig(events=(Event(LinearObservable(w=w)), Event(fn))),
        64, 2, dtype=jnp.float32)
    assert spec is not None
    assert spec.kinds == ("lin", "traced")
    assert spec.traced[0] is None and spec.traced[1] is not None


# ------------------------------------------------ fused loop parity --


def test_traced_event_keeps_persistent_path_and_matches_xla():
    """The VERDICT r4 #3 done-criterion: a hand-written jnp event fn keeps
    path=pallas-loop-persistent; located times/states match the XLA driver
    running the SAME callable."""
    mod, y0 = _driven64()
    fn = lambda t, x: x.re[3]          # Re z_3 crossing zero
    ev = EventConfig(events=(Event(fn),), t_tol=1e-5)
    grid = make_grid(jnp.float32(0.0), jnp.float32(0.5), dtype=jnp.float32)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, grid, CTL64, ev)
    assert sol is not None and sol.path == "pallas-loop-persistent"

    st_x = vexp.MagnusModulated4(mod, use_pallas=False)
    sol_x = integrate(
        st_x.make_step_fn(), y0, grid, 1e-2, adaptive=True, ctl=CTL64,
        error_norm=st_x.error_norm, batch_shape=(y0.re.shape[0],),
        event_cfg=ev,
    )
    f_f, f_x = np.asarray(sol.event_found), np.asarray(sol_x.event_found)
    np.testing.assert_array_equal(f_f, f_x)
    m = f_f[:, 0]
    assert m.any()
    np.testing.assert_allclose(np.asarray(sol.event_t)[m],
                               np.asarray(sol_x.event_t)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol.event_y.re)[m],
                               np.asarray(sol_x.event_y.re)[m], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sol.n_accept),
                                  np.asarray(sol_x.n_accept))


def test_traced_event_matches_declared_equivalent():
    """A traced |z_1|^2 - c IS QuadraticObservable written by hand: both
    kernel runs must locate identical event times (the traced evaluation
    and the one-hot row reduction compute the same g)."""
    mod, y0 = _driven64(seed=33)
    c = 0.04
    fn = lambda t, x: x.re[1] ** 2 + x.im[1] ** 2 - c
    obs = QuadraticObservable(q=np.eye(64)[1], c=c)
    grid = make_grid(jnp.float32(0.0), jnp.float32(0.5), dtype=jnp.float32)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol_t = _run_fused(st, y0, grid, CTL64,
                       EventConfig(events=(Event(fn, direction=1),),
                                   t_tol=1e-5))
    sol_d = _run_fused(st, y0, grid, CTL64,
                       EventConfig(events=(Event(obs, direction=1),),
                                   t_tol=1e-5))
    assert sol_t is not None and sol_d is not None
    np.testing.assert_array_equal(np.asarray(sol_t.event_found),
                                  np.asarray(sol_d.event_found))
    m = np.asarray(sol_t.event_found)[:, 0]
    np.testing.assert_allclose(np.asarray(sol_t.event_t)[m],
                               np.asarray(sol_d.event_t)[m], atol=1e-6)


def test_traced_terminal_event_time_dependent():
    """g depends on t too (the full g(t, x) contract): a time-shifted
    threshold terminates each trajectory, kernel vs XLA driver."""
    mod, y0 = _driven64(seed=5)
    # unitary evolution keeps sum|z|^2 == 1, so g ~ 0.2 t - 0.1 crosses
    # zero (rising) at t ~ 0.5 — but only through the state-dependent term
    fn = lambda t, x: jnp.sum(x.re ** 2 + x.im ** 2) * 0.2 * t - 0.1
    ev = EventConfig(events=(Event(fn, direction=1, terminal=True),),
                     t_tol=1e-5)
    grid = make_grid(jnp.float32(0.0), jnp.float32(1.0), dtype=jnp.float32)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, grid, CTL64, ev)
    assert sol is not None and sol.path == "pallas-loop-persistent"
    assert (np.asarray(sol.status) == vo.DONE_EVENT).all()

    sol_x = ensemble_solve(
        mod, y0, 0.0, 1.0,
        stepper=vexp.MagnusModulated4(mod, use_pallas=False),
        adaptive=True, h0=1e-2, ctl=CTL64, time_dtype=jnp.float32,
        events=ev,
    )
    np.testing.assert_allclose(np.asarray(sol.event_t),
                               np.asarray(sol_x.event_t), atol=1e-5)


def test_rk_loop_traced_event(monkeypatch):
    """The fused RK loop runs traced events too."""
    from vec_ode_tpu.ops import pallas_loop
    from vec_ode_tpu.ops.pallas_rk import FusedModulatedLinearRK

    model = DrivenDense.make(d=64, seed=0)
    _, y0 = _driven64(seed=41)
    ctl = vo.StepControl(rtol=1e-4, min_dt=1e-6, max_dt=0.25,
                         max_steps=2000)
    t_grid = make_grid(jnp.float32(0), jnp.float32(0.5), dtype=jnp.float32)
    fn = lambda t, x: x.re[3]
    ev = EventConfig(events=(Event(fn),), t_tol=1e-5)
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
    assert sol_f is not None, "fused RK loop declined a traced event"

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    sol_x = integrate(
        st.make_step_fn(), y0, t_grid, 1e-2, adaptive=True, ctl=ctl,
        error_norm=st.error_norm, batch_shape=(y0.re.shape[0],),
        event_cfg=ev,
    )
    f_f = np.asarray(sol_f.event_found)
    np.testing.assert_array_equal(f_f, np.asarray(sol_x.event_found))
    m = f_f[:, 0]
    assert m.any()
    np.testing.assert_allclose(np.asarray(sol_f.event_t)[m],
                               np.asarray(sol_x.event_t)[m], atol=1e-5)


# ------------------------------------------------------- fallbacks --


def test_traced_event_lane_packed_falls_back():
    """Lane-packed configs (d=2 LZ, G=64) cannot unpack rows in-kernel:
    fused_loop_solve declines a traced event (named fallback) and the XLA
    driver runs it with identical semantics."""
    lz = LandauZener(v=2.0, delta=0.4)
    mod = lz.modulated(jnp.float32)
    psi0 = np.zeros((64, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    fn = lambda t, x: x.re[1] ** 2 + x.im[1] ** 2 - 0.05
    ev = EventConfig(events=(Event(fn, direction=1, terminal=True),),
                     t_tol=1e-4)
    ctl = vo.StepControl(rtol=1e-5, max_steps=4000, min_dt=1e-4, max_dt=1.0)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, jnp.asarray([-20.0, 20.0], jnp.float32),
                     ctl, ev)
    assert sol is None
    sol2 = ensemble_solve(
        mod, y0, -20.0, 20.0, stepper=st, adaptive=True, h0=1e-2,
        ctl=ctl, time_dtype=jnp.float32, events=ev,
    )
    assert (np.asarray(sol2.status) == vo.DONE_EVENT).all()


def test_untraceable_event_falls_back():
    mod, y0 = _driven64()

    def bad(t, x):
        return float(np.asarray(x.re).max())  # concretizes under tracing

    ev = EventConfig(events=(Event(bad),), t_tol=1e-5)
    grid = make_grid(jnp.float32(0.0), jnp.float32(0.5), dtype=jnp.float32)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = _run_fused(st, y0, grid, CTL64, ev)
    assert sol is None
