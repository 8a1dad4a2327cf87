"""Regression tests for the round-3 review findings (auto-batched
compatibility fallbacks, NaN h0, explicit batched=True validation,
zero-row CFM tableaus)."""

import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu import lc
from vec_ode_tpu.models import DrivenDense
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_solve


def _y0(B=8, d=8, seed=0):
    rng = np.random.default_rng(seed)
    psi = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    return cp.from_complex(psi, jnp.float64)


def test_custom_error_norm_still_works_with_auto_batched_stepper():
    """Pre-r3 calls with a custom error_norm must keep working: the
    AUTO-batched dense stepper quietly takes the vmapped path."""
    model = DrivenDense.make(d=8, seed=0)

    def my_norm(e):
        return 2.0 * lc.norm_l2(e)  # tighter steps than the default

    sol = ensemble_solve(
        lambda t: model.op_pair(t, jnp.float64), _y0(), 0.0, 0.3,
        stepper=vexp.Magnus4(vexp.DenseCplxSplit()), adaptive=True,
        ctl=vo.StepControl(rtol=1e-6, max_dt=0.25), h0=1e-2,
        error_norm=my_norm, time_dtype=jnp.float64,
    )
    assert bool(jnp.all(sol.success))
    sol_def = ensemble_solve(
        lambda t: model.op_pair(t, jnp.float64), _y0(), 0.0, 0.3,
        stepper=vexp.Magnus4(vexp.DenseCplxSplit()), adaptive=True,
        ctl=vo.StepControl(rtol=1e-6, max_dt=0.25), h0=1e-2,
        time_dtype=jnp.float64,
    )
    # the doubled norm must actually bite (more steps accepted)
    assert int(np.asarray(sol.n_accept).sum()) > int(
        np.asarray(sol_def.n_accept).sum())


def test_scaled_error_still_works_with_auto_batched_stepper():
    model = DrivenDense.make(d=8, seed=0)
    sol = ensemble_solve(
        lambda t: model.op_pair(t, jnp.float64), _y0(), 0.0, 0.3,
        stepper=vexp.CFM4(vexp.DenseCplxSplit()), adaptive=True,
        ctl=vo.StepControl(rtol=1e-6, max_dt=0.25, scaled_error=True),
        h0=1e-2, time_dtype=jnp.float64,
    )
    assert bool(jnp.all(sol.success))


def test_nan_h0_rejected():
    with pytest.raises(ValueError, match="not inside the range"):
        vo.solve_ivp(lambda t, y: -y, 0.0, 1.0, jnp.ones(3),
                     h0=float("nan"))
    with pytest.raises(ValueError, match="not inside the range"):
        ensemble_solve(lambda t, y: -y, jnp.ones((4, 3)), 0.0, 1.0,
                       h0=jnp.asarray([1e-3, jnp.nan, 1e-3, 1e-3]))


def test_explicit_batched_true_requires_dense_split():
    st = vexp.Magnus4(vexp.DiagonalCplxSplit(), batched=True)
    with pytest.raises(ValueError, match="batched=True requires"):
        ensemble_solve(
            lambda t: cp.Cplx(jnp.zeros(4), -jnp.ones(4)), _y0(d=4),
            0.0, 0.1, stepper=st, adaptive=True, h0=1e-2,
        )


def test_cfm_zero_row_batched_matches_scalar():
    """An all-zero tableau row (identity exponential) must not crash the
    batched dense path."""
    model = DrivenDense.make(d=8, seed=0)
    alpha = ((0.5, 0.5), (0.0, 0.0))  # second exponential is e^0 = I
    mk = lambda **kw: vexp.CFM(
        split=vexp.DenseCplxSplit(), alpha=alpha,
        c=(0.2113248654051871, 0.7886751345948129),
        alpha_err=((0.5, 0.5),), **kw)

    def solve(st):
        return ensemble_solve(
            lambda t: model.op_pair(t, jnp.float64), _y0(seed=3), 0.0, 0.2,
            stepper=st, adaptive=True,
            ctl=vo.StepControl(rtol=1e-6, max_dt=0.25), h0=1e-2,
            time_dtype=jnp.float64,
        )

    a = solve(mk())
    b = solve(mk(batched=False))
    assert bool(jnp.all(a.success))
    np.testing.assert_allclose(np.asarray(a.y_final.re),
                               np.asarray(b.y_final.re), atol=1e-11)


def test_compact_with_batched_dense_stepper():
    """ensemble_solve_compact drives the natively-batched generic stepper
    (norm-returning) and matches ensemble_solve lane for lane."""
    from vec_ode_tpu.parallel import ensemble_solve_compact

    model = DrivenDense.make(d=8, seed=0)
    y0 = _y0(B=12, d=8, seed=5)
    ctl = vo.StepControl(rtol=1e-6, max_dt=0.25, max_steps=100000)
    op = lambda t: model.op_pair(t, jnp.float64)
    st = vexp.Magnus4(vexp.DenseCplxSplit())
    assert st.is_batched

    sol_c, stats = ensemble_solve_compact(
        op, y0, 0.0, 0.4, stepper=st, adaptive=True, ctl=ctl, h0=1e-2,
        time_dtype=jnp.float64, chunk_iters=8, min_batch=4,
        bucket_multiple=4,
    )
    sol_p = ensemble_solve(
        op, y0, 0.0, 0.4, stepper=st, adaptive=True, ctl=ctl, h0=1e-2,
        time_dtype=jnp.float64,
    )
    assert stats["efficiency"] > 0
    np.testing.assert_array_equal(np.asarray(sol_c.n_accept),
                                  np.asarray(sol_p.n_accept))
    np.testing.assert_allclose(np.asarray(sol_c.y_final.re),
                               np.asarray(sol_p.y_final.re), atol=1e-12)


# ---- round-4 review findings (regression pins) -------------------------


def test_batched_dense_steppers_with_params():
    """r4 review finding 1: the stacked quadrature sampling must TILE
    per-trajectory params to the concatenated node times — all four
    batched dense steppers run an ensemble params sweep."""
    import vec_ode_tpu as vo
    from vec_ode_tpu import exp as vexp
    from vec_ode_tpu.models import DrivenDense
    from vec_ode_tpu.ops import cplx as cp
    from vec_ode_tpu.parallel import ensemble_solve

    model = DrivenDense.make(d=8, seed=0)
    B = 8
    rng = np.random.default_rng(3)
    z = rng.standard_normal((B, 8)) + 1j * rng.standard_normal((B, 8))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    y0 = cp.from_complex(z, jnp.float64)
    amps = jnp.linspace(0.5, 1.5, B)

    def op_fn(t, a):
        pair = model.op_pair(t, jnp.float64)
        return cp.Cplx(a * pair.re, a * pair.im)

    ctl = vo.StepControl(rtol=1e-8, min_dt=1e-6, max_dt=0.3)
    for st in (vexp.Magnus4(vexp.DenseCplxSplit()),
               vexp.Magnus4(vexp.DenseCplxSplit(), fast_error=True),
               vexp.Magnus6(vexp.DenseCplxSplit()),
               vexp.CFM4(vexp.DenseCplxSplit())):
        sol = ensemble_solve(op_fn, y0, 0.0, 0.8, stepper=st,
                             adaptive=True, h0=1e-2, ctl=ctl, params=amps)
        assert (np.asarray(sol.status) == vo.DONE).all(), type(st).__name__
        # params actually bite: different amplitudes, different accepts
        assert len(set(np.asarray(sol.n_accept).tolist())) > 1
        # and the scalar path agrees per trajectory (oracle)
        import dataclasses as _dc

        s0 = vo.solve_linear(lambda t: op_fn(t, amps[3]), 0.0, 0.8,
                             cp.Cplx(y0.re[3], y0.im[3]),
                             stepper=_dc.replace(st, batched=False),
                             adaptive=True, ctl=ctl, h0=1e-2)
        np.testing.assert_allclose(np.asarray(sol.y_final.re[3]),
                                   np.asarray(s0.y_final.re),
                                   rtol=1e-9, atol=1e-9)


def test_weighted_norm_equality_and_remat_validation():
    """r4 review findings 2+3: WeightedNorm with array weights is
    comparable (flat weights normalize to a tuple), and remat_levels on
    the while driver raises instead of being silently ignored."""
    import vec_ode_tpu as vo
    from vec_ode_tpu import lc

    a = lc.WeightedNorm("l2", weights=np.asarray([1.0, 2.0]))
    b = lc.WeightedNorm("l2", weights=np.asarray([1.0, 2.0]))
    assert bool(a == b) and hash(a) == hash(b)
    assert a != lc.WeightedNorm("l2", weights=np.asarray([1.0, 3.0]))

    with pytest.raises(ValueError, match="remat_levels"):
        vo.solve_ivp(lambda t, y: -y, 0.0, 1.0, jnp.asarray([1.0]),
                     remat_levels=2)
