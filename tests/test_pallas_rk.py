"""Fused RK step (Pallas kernel in interpret mode on CPU + XLA fallback)
against the generic driver path."""

import jax
import jax.numpy as jnp
import numpy as np

import vec_ode_tpu as vo
from vec_ode_tpu.models import DrivenDense
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.ops.pallas_rk import (
    FusedModulatedLinearRK,
    fused_rk_step,
    xla_rk_step,
)
from vec_ode_tpu.parallel import ensemble_solve


def setup(B=8, d=64, dtype=jnp.float32):
    model = DrivenDense.make(d=d, seed=0)
    rng = np.random.default_rng(3)
    psi0 = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, dtype)
    stepper = FusedModulatedLinearRK.from_driven_dense(model, dtype)
    return model, y0, stepper


def test_xla_step_matches_generic_rhs():
    model, y0, st = setup(B=4, d=64, dtype=jnp.float64)
    t = jnp.asarray([0.0, 0.1, 0.2, 0.3], jnp.float64)
    dt = jnp.full((4,), 0.01, jnp.float64)
    xw = jnp.concatenate([y0.re, y0.im], axis=-1)
    ox, oe = xla_rk_step(
        t, dt, xw,
        st.M0.astype(jnp.float64), st.M1.astype(jnp.float64),
        u_fn=st.u_fn,
    )
    # generic path: vmapped rk_step over the pair rhs
    from vec_ode_tpu.rk import rk_step

    def one(ti, yi_re, yi_im, dti):
        xn, err = rk_step(
            lambda tt, y: model.rhs_pair(tt, y, jnp.float64),
            ti, cp.Cplx(yi_re, yi_im), dti, vo.RKF45,
        )
        from vec_ode_tpu import lc

        return xn, lc.norm_l2(err)

    xn, en = jax.vmap(one)(t, y0.re, y0.im, dt)
    # same math, different contraction/association order -> ~1e-11 slack
    np.testing.assert_allclose(
        np.asarray(ox[:, :64]), np.asarray(xn.re), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(ox[:, 64:]), np.asarray(xn.im), atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(oe), np.asarray(en), rtol=1e-3)


def test_pallas_interpret_matches_xla():
    model, y0, st = setup(B=256, d=64, dtype=jnp.float32)
    t = jnp.linspace(0.0, 0.5, 256, dtype=jnp.float32)
    dt = jnp.full((256,), 0.02, jnp.float32)
    xw = jnp.concatenate([y0.re, y0.im], axis=-1)
    # pad the batch: from setup B=8? no, B=256 already tile-sized
    ox_p, oe_p = fused_rk_step(
        t, dt, xw, st.M0, st.M1, u_fn=st.u_fn, tile=256, interpret=True,
    )
    ox_x, oe_x = xla_rk_step(t, dt, xw, st.M0, st.M1, u_fn=st.u_fn)
    np.testing.assert_allclose(np.asarray(ox_p), np.asarray(ox_x), atol=2e-6)
    np.testing.assert_allclose(np.asarray(oe_p), np.asarray(oe_x), rtol=2e-3,
                               atol=1e-10)


def test_fused_stepper_ensemble_matches_generic():
    model, y0, st = setup(B=16, d=64, dtype=jnp.float64)
    st64 = FusedModulatedLinearRK(
        M0=st.M0.astype(jnp.float64), M1=st.M1.astype(jnp.float64),
        u_fn=st.u_fn, use_pallas=False,
    )
    ctl = vo.StepControl(rtol=1e-8, max_dt=0.25)
    sol_f = ensemble_solve(
        None, y0, 0.0, 0.5, stepper=st64, ctl=ctl, h0=1e-3,
        time_dtype=jnp.float64,
    )
    sol_g = ensemble_solve(
        lambda t, y: model.rhs_pair(t, y, jnp.float64), y0, 0.0, 0.5,
        ctl=ctl, h0=1e-3, time_dtype=jnp.float64,
    )
    assert all(int(s) == vo.DONE for s in sol_f.status)
    np.testing.assert_array_equal(
        np.asarray(sol_f.n_accept), np.asarray(sol_g.n_accept)
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.y_final.re), np.asarray(sol_g.y_final.re),
        atol=1e-9,
    )
    assert sol_f.ts.shape == (16, 2)


def test_fused_stepper_sharded():
    from vec_ode_tpu.parallel import ensemble_mesh, shard_batch

    model, y0, st = setup(B=32, d=64, dtype=jnp.float32)
    st = FusedModulatedLinearRK(
        M0=st.M0, M1=st.M1, u_fn=st.u_fn, use_pallas=False,
    )
    mesh = ensemble_mesh()
    ctl = vo.StepControl(rtol=1e-6, max_dt=0.25)
    sol = ensemble_solve(
        None, shard_batch(y0, mesh), 0.0, 0.3, stepper=st, ctl=ctl,
        h0=1e-3, time_dtype=jnp.float32, mesh=mesh,
    )
    assert all(int(s) == vo.DONE for s in sol.status)
    norms = np.linalg.norm(np.asarray(cp.to_complex(sol.y_final)), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_fused_rejects_rhs():
    _, _, st = setup()
    try:
        st.make_step_fn(lambda t, y: y)
        assert False
    except ValueError:
        pass


def test_fused_non_embedded_tableau_adaptive_raises():
    # RK4 has no embedded pair: the adaptive driver must raise, not silently
    # accept on a zero error estimate
    _, y0, st = setup(B=8, d=64, dtype=jnp.float64)
    st4 = FusedModulatedLinearRK(
        M0=st.M0.astype(jnp.float64), M1=st.M1.astype(jnp.float64),
        u_fn=st.u_fn, tableau=vo.RK4, use_pallas=False,
    )
    try:
        ensemble_solve(None, y0, 0.0, 0.1, stepper=st4, adaptive=True,
                       h0=1e-2, time_dtype=jnp.float64)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "error estimate" in str(e)
    # fixed-step mode works fine
    sol = ensemble_solve(None, y0, 0.0, 0.1, stepper=st4, adaptive=False,
                         h0=1e-2, time_dtype=jnp.float64)
    assert all(int(s) == vo.DONE for s in sol.status)


def test_rk_fused_loop_interpret_matches_driver(monkeypatch):
    """The RK on-chip loop (ops/pallas_loop.make_rk_step_builder +
    FusedModulatedLinearRK.fused_loop_solve) must reproduce the XLA driver's
    statuses, counters and trajectories (interpret mode; on-TPU parity is
    exercised by bench.py / the verify flows)."""
    import vec_ode_tpu as vo
    from vec_ode_tpu.driver import integrate, make_grid
    from vec_ode_tpu.models import DrivenDense
    from vec_ode_tpu.ops import cplx as cp
    from vec_ode_tpu.ops import pallas_loop
    from vec_ode_tpu.ops.pallas_rk import FusedModulatedLinearRK

    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(31)
    B = 16
    z = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    y0 = cp.from_complex(z, jnp.float32)
    ctl = vo.StepControl(rtol=1e-4, min_dt=1e-6, max_dt=0.25, max_steps=500)
    t_grid = make_grid(jnp.float32(0), jnp.float32(0.3), dtype=jnp.float32)

    st = FusedModulatedLinearRK.from_driven_dense(model, jnp.float32)

    # force pallas interpret mode + tiny tile so B=16 is tileable
    orig_chunk = pallas_loop.fused_loop_chunk

    def chunk_interp(*args, **kw):
        kw["interpret"] = True
        kw["tile"] = 8
        return orig_chunk(*args, **kw)

    monkeypatch.setattr(pallas_loop, "fused_loop_chunk", chunk_interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    sol_f = st.fused_loop_solve(y0, t_grid, 1e-2, ctl=ctl, adaptive=True)
    assert sol_f is not None, "fused RK loop did not engage"

    sol_x = integrate(
        st.make_step_fn(), y0, t_grid, 1e-2, adaptive=True, ctl=ctl,
        error_norm=st.error_norm, batch_shape=(B,),
    )
    assert (np.asarray(sol_f.status) == vo.DONE).all()
    a_f, a_x = np.asarray(sol_f.n_accept), np.asarray(sol_x.n_accept)
    assert (a_f == a_x).mean() > 0.8, (a_f, a_x)
    np.testing.assert_allclose(np.asarray(sol_f.y_final.re),
                               np.asarray(sol_x.y_final.re),
                               rtol=2e-4, atol=2e-4)


def test_rk_fused_loop_scaled_error_matches_vector_stepper(monkeypatch):
    """ctl.scaled_error in the RK loop kernel: the builder scales the error
    VECTOR exactly as controller.error_measure does for vector-error
    steppers. Oracle: the plain (non-batched) RungeKutta stepper with the
    same tableau and the same modulated-linear RHS, vmapped by the driver,
    where the XLA path natively implements scaled_error."""
    import vec_ode_tpu as vo
    from vec_ode_tpu.driver import make_grid
    from vec_ode_tpu.models import DrivenDense
    from vec_ode_tpu.ops import cplx as cp
    from vec_ode_tpu.ops import pallas_loop
    from vec_ode_tpu.ops.pallas_rk import FusedModulatedLinearRK
    from vec_ode_tpu.parallel import ensemble_solve

    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(33)
    B = 16
    z = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    y0 = cp.from_complex(z, jnp.float32)
    ctl = vo.StepControl(rtol=1e-4, atol=1e-8, scaled_error=True,
                         min_dt=1e-6, max_dt=0.25, max_steps=500)
    t_grid = make_grid(jnp.float32(0), jnp.float32(0.3), dtype=jnp.float32)

    st = FusedModulatedLinearRK.from_driven_dense(model, jnp.float32)
    orig_chunk = pallas_loop.fused_loop_chunk

    def chunk_interp(*args, **kw):
        kw["interpret"] = True
        kw["tile"] = 8
        return orig_chunk(*args, **kw)

    monkeypatch.setattr(pallas_loop, "fused_loop_chunk", chunk_interp)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    sol_f = st.fused_loop_solve(y0, t_grid, 1e-2, ctl=ctl, adaptive=True)
    assert sol_f is not None, "fused RK loop did not engage with scaled"
    assert (np.asarray(sol_f.status) == vo.DONE).all()

    # vector-error oracle: same widened real-pair linear RHS, same tableau,
    # scalar driver vmapped by ensemble_solve; scaled_error handled by
    # controller.error_measure on the error vector
    M0 = jnp.asarray(st.M0, jnp.float32)
    M1 = jnp.asarray(st.M1, jnp.float32)

    def rhs(t, xw):
        from vec_ode_tpu.utils.prec import HIGHEST
        u = jnp.cos(jnp.float32(model.w) * t)
        return (jnp.einsum("ij,j->i", M0, xw, precision=HIGHEST)
                + u * jnp.einsum("ij,j->i", M1, xw, precision=HIGHEST))

    yw0 = jnp.concatenate([y0.re, y0.im], axis=-1)
    sol_v = ensemble_solve(rhs, yw0, 0.0, 0.3,
                           stepper=vo.RungeKutta(vo.RKF45), adaptive=True,
                           ctl=ctl, h0=1e-2, time_dtype=jnp.float32)
    assert (np.asarray(sol_v.status) == vo.DONE).all()
    a_f, a_v = np.asarray(sol_f.n_accept), np.asarray(sol_v.n_accept)
    assert (a_f == a_v).mean() > 0.8, (a_f, a_v)
    yf_f = np.concatenate([np.asarray(sol_f.y_final.re),
                           np.asarray(sol_f.y_final.im)], axis=-1)
    np.testing.assert_allclose(yf_f, np.asarray(sol_v.y_final),
                               rtol=2e-4, atol=2e-4)
    # and scaled at tiny atol on unit-sphere states is stricter than plain
    sol_u = st.fused_loop_solve(
        y0, t_grid, 1e-2,
        ctl=vo.StepControl(rtol=1e-4, min_dt=1e-6, max_dt=0.25,
                           max_steps=500),
        adaptive=True)
    assert (np.asarray(sol_f.n_accept)
            >= np.asarray(sol_u.n_accept)).all()
