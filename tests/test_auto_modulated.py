"""auto_modulated: structure recovery from black-box operator callbacks
(the bridge from the reference's generic contract, magnus.rs:32, onto the
shared-basis fast path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.models import DrivenDense
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_solve


def _y0(B, d, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    psi = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    return cp.from_complex(psi, dtype)


def test_recovers_rank_two_structure():
    model = DrivenDense.make(d=16, seed=0)
    op_fn = lambda t: model.op_pair(t, jnp.float64)
    mod = vexp.auto_modulated(op_fn, 0.0, 2.0)
    assert mod is not None
    assert mod.n_terms == 2  # H0 + cos(wt) V
    # reconstruction at an arbitrary time
    t = 0.7137
    A = op_fn(t)
    R = mod.assemble(jnp.asarray(t, jnp.float64))
    assert float(jnp.max(jnp.abs(R.re - A.re))) < 1e-10
    assert float(jnp.max(jnp.abs(R.im - A.im))) < 1e-10


def test_rejects_unstructured_operator():
    d = 8
    rng = np.random.default_rng(1)
    Ms = rng.standard_normal((40, d, d))

    def op_fn(t):
        # 40 Chebyshev-weighted directions: rank > k_max over [0, 1]
        w = jnp.cos(jnp.arange(40) * 2.1 * jnp.asarray(t))
        return cp.Cplx(
            jnp.einsum("k,kij->ij", w, jnp.asarray(Ms)),
            jnp.zeros((d, d)),
        )

    assert vexp.auto_modulated(op_fn, 0.0, 1.0, k_max=8) is None


def test_rejects_nan_operator():
    def op_fn(t):
        return cp.Cplx(jnp.full((4, 4), jnp.nan), jnp.zeros((4, 4)))

    assert vexp.auto_modulated(op_fn, 0.0, 1.0) is None


def test_zero_operator_returns_none():
    def op_fn(t):
        return cp.Cplx(jnp.zeros((4, 4)), jnp.zeros((4, 4)))

    assert vexp.auto_modulated(op_fn, 0.0, 1.0) is None


def test_solve_via_auto_matches_generic():
    """End to end: black-box op_fn -> auto_modulated -> MagnusModulated4
    reproduces the generic Magnus4(DenseCplxSplit) solve."""
    model = DrivenDense.make(d=16, seed=0)
    op_fn = lambda t: model.op_pair(t, jnp.float64)
    mod = vexp.auto_modulated(op_fn, 0.0, 1.0)
    assert mod is not None
    B = 8
    y0 = _y0(B, 16)
    ctl = vo.StepControl(rtol=1e-8, min_dt=1e-6, max_dt=0.25)

    sol_a = ensemble_solve(
        None, y0, 0.0, 1.0, stepper=vexp.MagnusModulated4(mod),
        adaptive=True, ctl=ctl, h0=1e-2, time_dtype=jnp.float64,
    )
    sol_g = ensemble_solve(
        op_fn, y0, 0.0, 1.0, stepper=vexp.Magnus4(vexp.DenseCplxSplit()),
        adaptive=True, ctl=ctl, h0=1e-2, time_dtype=jnp.float64,
    )
    assert bool(jnp.all(sol_a.success))
    for pa, pb in [(sol_a.y_final.re, sol_g.y_final.re),
                   (sol_a.y_final.im, sol_g.y_final.im)]:
        assert float(jnp.max(jnp.abs(pa - pb))) < 1e-7


def test_real_operator_support():
    A0 = np.diag(np.arange(1.0, 5.0))
    A1 = np.eye(4)[::-1].copy()

    def op_fn(t):
        return jnp.asarray(A0) + jnp.sin(jnp.asarray(t)) * jnp.asarray(A1)

    mod = vexp.auto_modulated(op_fn, 0.0, 3.0)
    assert mod is not None and mod.n_terms == 2 and not mod.is_cplx
    R = mod.assemble(jnp.asarray(1.234))
    ref = op_fn(1.234)
    assert float(jnp.max(jnp.abs(R - ref))) < 1e-10


def test_fit_cols_enables_fused_loop():
    """fit_cols (default): the recovered coefficients get a validated
    Chebyshev coeff_cols_fn, so the BLACK-BOX contract reaches the
    whole-loop fused kernel — here with lane packing (d=2 -> G=32)."""
    from vec_ode_tpu.models import LandauZener
    from vec_ode_tpu.ops import cplx as cp

    lz = LandauZener(v=2.0, delta=0.4)
    mod = vexp.auto_modulated(
        lambda t: lz.op_pair(t, jnp.float32), -20.0, 20.0,
        dtype=jnp.float32)
    assert mod is not None and mod.coeff_cols_fn is not None
    # cols view matches the projection coeff_fn
    for tv in (-17.3, 0.0, 4.56):
        c_proj = np.asarray(mod.coeff_fn(jnp.float32(tv)))
        cols = mod.coeff_cols_fn(jnp.full((4, 1), tv, jnp.float32))
        c_cols = np.asarray([float(c[0, 0]) for c in cols])
        np.testing.assert_allclose(c_cols, c_proj, rtol=1e-5, atol=1e-5)

    B = 256
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    ctl = vo.StepControl(rtol=1e-5, max_steps=20000)
    st = vexp.MagnusModulated4(mod, interpret=True)
    sol = st.fused_loop_solve(
        y0, jnp.asarray([-20.0, 20.0], jnp.float32), 0.05, ctl=ctl,
        adaptive=True)
    assert sol is not None, "fused loop did not engage for auto op"
    assert sol.path.endswith("-packed"), sol.path
    oracle = ensemble_solve(
        mod, y0, -20.0, 20.0,
        stepper=vexp.MagnusModulated4(mod, use_pallas=False),
        ctl=ctl, h0=0.05, time_dtype=jnp.float32,
    )
    assert (np.asarray(sol.status) == vo.DONE).all()
    for a, b in [(sol.y_final.re, oracle.y_final.re),
                 (sol.y_final.im, oracle.y_final.im)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4)


def test_fit_cols_rejects_unfittable_coefficients():
    """A coefficient far beyond the Chebyshev budget (chirp with ~1000
    oscillations) must fail held-out validation: the operator is still
    recovered, but coeff_cols_fn stays None (per-step path only)."""
    sz = jnp.asarray([[0.5, 0.0], [0.0, -0.5]], jnp.float64)

    def op_fn(t):
        t = jnp.asarray(t)
        return jnp.cos(8.0 * t * t) * sz

    mod = vexp.auto_modulated(op_fn, 0.0, 30.0)
    assert mod is not None and mod.n_terms == 1
    assert mod.coeff_cols_fn is None


def test_fit_cols_opt_out():
    sz = jnp.asarray([[0.5, 0.0], [0.0, -0.5]], jnp.float64)
    mod = vexp.auto_modulated(
        lambda t: jnp.sin(jnp.asarray(t)) * sz, 0.0, 3.0,
        fit_cols=False)
    assert mod is not None and mod.coeff_cols_fn is None
