"""Unit tests for the per-trajectory dense exponential kernel
(ops/pallas_dense.py) and its batched stepper wiring (exp/dense_fast.py).

The fused kernel runs in interpret mode on the CPU backend; its XLA
reference (dense_chains_xla) is the parity oracle, itself checked against
ops.expm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.models import DrivenDense
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.ops.expm import expm
from vec_ode_tpu.ops.pallas_dense import (
    dense_chains_xla,
    fused_dense_chain_apply,
)
from vec_ode_tpu.parallel import ensemble_solve

B, D = 16, 128


def _rand_ops(n, scale=0.15, seed=0):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(
            rng.standard_normal((B, D, D)).astype(np.float32) * scale / D**0.5
        )
        for _ in range(n)
    ]


def _x():
    rng = np.random.default_rng(1)
    return jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))


def test_dense_chains_xla_matches_expm():
    """The XLA reference path == expm-based propagator application."""
    (W,) = _rand_ops(1)
    xw = _x()
    y, e = dense_chains_xla([[W], [0.5 * W]], xw, m=12, theta=1.0)
    U = expm(W.astype(jnp.float64), method="taylor")
    y_ref = jnp.einsum("bij,bj->bi", U, xw.astype(jnp.float64))
    assert float(jnp.max(jnp.abs(y - y_ref.astype(jnp.float32)))) < 1e-5
    U2 = expm(0.5 * W.astype(jnp.float64), method="taylor")
    e_ref = jnp.linalg.norm(
        jnp.einsum("bij,bj->bi", U2, xw.astype(jnp.float64)) - y_ref, axis=-1
    )
    assert float(jnp.max(jnp.abs(e - e_ref.astype(jnp.float32)))) < 1e-5


def test_fused_kernel_interpret_matches_xla_reference():
    """Kernel (interpret) == dense_chains_xla on a 2-chain Magnus-like
    structure with an in-kernel commutator."""
    from vec_ode_tpu.ops.pallas_dense import _mm
    from vec_ode_tpu.utils.prec import HIGHEST

    A1, A2 = _rand_ops(2)
    xw = _x()
    dt = jnp.asarray(
        np.random.default_rng(2).uniform(0.05, 0.2, B).astype(np.float32)
    )

    def chain_builder(mats, scalars):
        M1, M2 = mats
        (dt_s,) = scalars[0]
        w1 = (0.5 * dt_s) * (M1 + M2)
        comm = _mm(M1, M2, HIGHEST) - _mm(M2, M1, HIGHEST)
        return [[w1 + (0.1 * dt_s * dt_s) * comm], [w1]]

    node_ops = jnp.stack([A1, A2], axis=1).reshape(B * 2 * D, D)
    (y,), e = fused_dense_chain_apply(
        [dt[:, None]], node_ops, (xw,), chain_builder,
        n_nodes=2, m=12, theta=1.0, interpret=True,
    )

    dt3 = dt[:, None, None]
    w1 = 0.5 * dt3 * (A1 + A2)
    mmb = lambda a, b: jnp.matmul(a, b, precision=HIGHEST)
    omega = w1 + 0.1 * dt3 * dt3 * (mmb(A1, A2) - mmb(A2, A1))
    y_ref, e_ref = dense_chains_xla([[omega], [w1]], xw, m=12, theta=1.0)
    assert float(jnp.max(jnp.abs(y - y_ref))) < 1e-6
    assert float(jnp.max(jnp.abs(e - e_ref))) < 1e-6


def test_fused_kernel_large_norm_squares():
    """Per-trajectory scaling engages (one lane with a large-norm exponent)
    and still matches the reference."""
    (W,) = _rand_ops(1)
    W = W.at[3].mul(40.0)  # push lane 3 past theta -> s > 0 there
    xw = _x()

    def chain_builder(mats, scalars):
        return [[mats[0]]]

    node_ops = W.reshape(B * D, D)
    (y,), _ = fused_dense_chain_apply(
        [jnp.zeros((B, 1), jnp.float32)], node_ops, (xw,), chain_builder,
        n_nodes=1, m=12, theta=1.0, interpret=True,
    )
    U = expm(W.astype(jnp.float64), method="taylor")
    y_ref = jnp.einsum("bij,bj->bi", U, xw.astype(jnp.float64))
    # per-lane RELATIVE error: the boosted lane's propagator amplifies the
    # state, so absolute tolerances are meaningless there
    scale = jnp.maximum(jnp.max(jnp.abs(y_ref), axis=1), 1.0)
    rel = jnp.max(jnp.abs(y - y_ref.astype(jnp.float32)), axis=1) / scale
    assert float(jnp.max(rel)) < 2e-4


@pytest.mark.parametrize("make", [
    lambda **kw: vexp.Magnus4(vexp.DenseCplxSplit(), **kw),
    lambda **kw: vexp.CFM4(vexp.DenseCplxSplit(), **kw),
    lambda **kw: vexp.Magnus6(vexp.DenseCplxSplit(), **kw),
])
def test_batched_stepper_matches_scalar_vmap_f64(make):
    """Natively-batched generic steppers (XLA fallback on CPU) reproduce
    the vmapped scalar path bit-near-exactly in f64."""
    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(0)
    psi = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi, jnp.float64)
    ctl = vo.StepControl(rtol=1e-6, min_dt=1e-6, max_dt=0.25)

    def solve(stepper):
        return ensemble_solve(
            lambda t: model.op_pair(t, jnp.float64), y0, 0.0, 0.5,
            stepper=stepper, adaptive=True, ctl=ctl, h0=1e-2,
            time_dtype=jnp.float64,
        )

    a = solve(make())
    b = solve(make(batched=False))
    assert bool(jnp.all(a.success)) and bool(jnp.all(b.success))
    assert np.array_equal(np.asarray(a.n_accept), np.asarray(b.n_accept))
    for pa, pb in [(a.y_final.re, b.y_final.re), (a.y_final.im, b.y_final.im)]:
        assert float(jnp.max(jnp.abs(pa - pb))) < 5e-9


@pytest.mark.parametrize("make", [
    lambda **kw: vexp.Magnus4(vexp.DenseCplxSplit(), **kw),
    lambda **kw: vexp.CFM4(vexp.DenseCplxSplit(), **kw),
    lambda **kw: vexp.ExpMidpoint(vexp.DenseCplxSplit(), **kw),
    lambda **kw: vexp.Magnus6(vexp.DenseCplxSplit(), **kw),
])
def test_batched_stepper_kernel_interpret_matches_xla(make):
    """Fused dense kernel (interpret mode) == XLA fallback through a full
    adaptive ensemble solve."""
    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(3)
    psi = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi, jnp.float32)
    ctl = vo.StepControl(rtol=1e-5, min_dt=1e-5, max_dt=0.25)
    adaptive = not isinstance(make(), vexp.ExpMidpoint)

    def solve(stepper):
        return ensemble_solve(
            lambda t: model.op_pair(t, jnp.float32), y0, 0.0, 0.3,
            stepper=stepper, adaptive=adaptive, ctl=ctl, h0=1e-2,
            time_dtype=jnp.float32,
        )

    a = solve(make(interpret=True))
    b = solve(make(use_pallas=False))
    for pa, pb in [(a.y_final.re, b.y_final.re), (a.y_final.im, b.y_final.im)]:
        assert float(jnp.max(jnp.abs(pa - pb))) < 1e-5


def test_unequal_chain_lengths():
    """CFM error chains are SHORTER than the main chain — no zero-row
    padding; the kernel handles per-chain lengths natively."""
    A1, A2 = _rand_ops(2, scale=0.3, seed=5)
    xw = _x()

    def chain_builder(mats, scalars):
        M1, M2 = mats
        return [[0.3 * M1, 0.3 * M2], [0.15 * (M1 + M2)]]

    node_ops = jnp.stack([A1, A2], axis=1).reshape(B * 2 * D, D)
    (y,), e = fused_dense_chain_apply(
        [jnp.zeros((B, 1), jnp.float32)], node_ops, (xw,), chain_builder,
        n_nodes=2, m=12, theta=1.0, interpret=True,
    )
    y_ref, e_ref = dense_chains_xla(
        [[0.3 * A1, 0.3 * A2], [0.15 * (A1 + A2)]], xw, m=12, theta=1.0)
    # kernel scaling is per-trajectory, the XLA reference's batch-global:
    # squaring counts can differ by 1 -> ~f32-eps-level roundoff deltas
    assert float(jnp.max(jnp.abs(y - y_ref))) < 1e-5
    assert float(jnp.max(jnp.abs(e - e_ref))) < 1e-5


def test_nan_lane_stays_local():
    """A NaN operator in one lane must not poison other lanes (the scaling
    guard keeps control flow finite)."""
    (W,) = _rand_ops(1)
    W = W.at[2].set(jnp.nan)
    xw = _x()

    def chain_builder(mats, scalars):
        return [[mats[0]], [0.5 * mats[0]]]

    (y,), e = fused_dense_chain_apply(
        [jnp.zeros((B, 1), jnp.float32)], W.reshape(B * D, D), (xw,),
        chain_builder, n_nodes=1, m=12, theta=1.0, interpret=True,
    )
    assert bool(jnp.all(jnp.isnan(y[2])))
    assert bool(jnp.all(jnp.isfinite(jnp.delete(y, 2, axis=0))))
    assert bool(jnp.all(jnp.isfinite(jnp.delete(e, 2, axis=0))))


def test_scalar_solve_linear_unchanged():
    """solve_linear (scalar path) still runs the reference-shaped pytree
    math for batched-capable steppers."""
    model = DrivenDense.make(d=8, seed=0)
    rng = np.random.default_rng(4)
    psi = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    psi /= np.linalg.norm(psi)
    y0 = cp.from_complex(psi, jnp.float64)
    sol = vo.solve_linear(
        lambda t: model.op_pair(t, jnp.float64), 0.0, 0.5, y0,
        stepper=vexp.Magnus4(vexp.DenseCplxSplit()), adaptive=True,
        ctl=vo.StepControl(rtol=1e-8, max_dt=0.25), h0=1e-2,
    )
    assert int(sol.status) == vo.DONE
    nrm = float(jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2)))
    assert abs(nrm - 1.0) < 1e-6


def _split_pair_ops(d=8, seed=11):
    """ops_fn(t) -> (La, Lb) Cplx pair for a driven split system."""
    rng = np.random.default_rng(seed)

    def herm():
        M = rng.standard_normal((d, d)) + 1j * rng.standard_normal((d, d))
        return (M + M.conj().T) / (2 * np.sqrt(d))

    HA, HB = herm(), herm()
    Ar = jnp.asarray(HA.imag, jnp.float64)
    Ai = jnp.asarray(-HA.real, jnp.float64)
    Br = jnp.asarray(HB.imag, jnp.float64)
    Bi = jnp.asarray(-HB.real, jnp.float64)

    def ops_fn(t):
        c = jnp.cos(1.3 * jnp.asarray(t))
        return (cp.Cplx(Ar * c, Ai * c), cp.Cplx(Br, Bi))

    return ops_fn


@pytest.mark.parametrize("make", [
    lambda **kw: vexp.SplitMidpoint(
        vexp.DenseCplxSplit(), vexp.DenseCplxSplit(), **kw),
    lambda **kw: vexp.SplitMidpoint(
        vexp.DenseCplxSplit(), vexp.DenseCplxSplit(),
        strict_reference_compat=True, **kw),
    lambda **kw: vexp.SplitCFM(
        vexp.DenseCplxSplit(), vexp.DenseCplxSplit(),
        rho=((0.5, 0.5),), sigma=((0.5, 0.0), (0.0, 0.5)),
        c=(0.2113248654051871, 0.7886751345948129), **kw),
])
def test_split_solvers_batched_matches_scalar_vmap(make):
    """r3: SplitMidpoint / SplitCFM over dense pairs execute natively
    batched (stacked expm of the whole factor palindrome) — must match
    the vmapped scalar path exactly."""
    d = 8
    ops_fn = _split_pair_ops(d=d)
    rng = np.random.default_rng(1)
    psi = rng.standard_normal((8, d)) + 1j * rng.standard_normal((8, d))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi, jnp.float64)

    def solve(stepper):
        return ensemble_solve(
            ops_fn, y0, 0.0, 0.4, stepper=stepper, adaptive=False,
            h0=0.02, time_dtype=jnp.float64,
        )

    a = solve(make())
    assert a.path in ("xla-driver", "xla-driver+pallas-step")
    b = solve(make(batched=False))
    assert bool(jnp.all(a.success))
    for pa, pb in [(a.y_final.re, b.y_final.re), (a.y_final.im, b.y_final.im)]:
        assert float(jnp.max(jnp.abs(pa - pb))) < 1e-12
