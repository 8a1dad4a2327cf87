"""Reversible adjoint for BLACK-BOX dense operators (diff.py:
make_adjoint_dense_solver) — the O(1)-memory gradient counterpart of the
reference's generic operator contract (magnus.rs:32): op_fn(t, theta) with
no modulated structure.

Oracle: the identical discrete forward map built with plain jax ops
(scan storing the trajectory, expm's own Fréchet-adjoint VJP) and
differentiated with jax's default AD — the reversible adjoint must
reproduce its gradients to reconstruction-drift accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import diff
from vec_ode_tpu.ops.cplx import Cplx
from vec_ode_tpu.ops.expm import expm
from vec_ode_tpu.utils.prec import HIGHEST


def op_real(t, theta):
    # parameterized non-commuting family: A(t) = th0 * S + sin(th1 t) * N
    S = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float64)
    N = jnp.asarray([[0.0, 1.0], [0.0, 0.0]], jnp.float64)
    return theta[0] * S + jnp.sin(theta[1] * t) * N


def oracle_solver(op_fn, n_steps, order):
    """Same rows, plain AD (O(n_steps) memory)."""
    inner = diff.make_adjoint_dense_solver(
        op_fn, n_steps=n_steps, order=order
    )
    # the custom_vjp-free forward: rebuild from the public pieces
    from vec_ode_tpu.exp.magnus import _B2, _C_MID, _SUB_LEN, _SUB_OFF

    rps = diff.rows_per_step(order)

    def omega(theta, t0, tf, r):
        dt = (tf - t0) / n_steps
        if order == 6:
            n, j = r // rps, r % rps
            t_r = t0 + n * dt + jnp.asarray(_SUB_OFF)[j] * dt
            dt_r = jnp.asarray(_SUB_LEN)[j] * dt
        else:
            t_r, dt_r = t0 + r * dt, dt
        if order == 2:
            return dt_r * op_fn(t_r + 0.5 * dt_r, theta)
        tm = t_r + 0.5 * dt_r
        A1 = op_fn(tm - _C_MID * dt_r, theta)
        A2 = op_fn(tm + _C_MID * dt_r, theta)
        comm = (jnp.matmul(A1, A2, precision=HIGHEST)
                - jnp.matmul(A2, A1, precision=HIGHEST))
        return 0.5 * dt_r * (A1 + A2) + (_B2 * dt_r * dt_r) * comm

    def solve(theta, y0, t0, tf):
        def body(x, r):
            P = expm(omega(theta, t0, tf, r))
            return jnp.einsum("ij,...j->...i", P, x, precision=HIGHEST), None

        yf, _ = jax.lax.scan(body, y0, jnp.arange(n_steps * rps))
        return yf

    return solve


@pytest.mark.parametrize("order", [2, 4, 6])
def test_gradient_matches_plain_ad_oracle(order):
    n_steps = 24
    theta = jnp.asarray([0.8, 1.7], jnp.float64)
    y0 = jnp.asarray([1.0, 0.25], jnp.float64)
    solver = diff.make_adjoint_dense_solver(
        op_real, n_steps=n_steps, order=order
    )
    oracle = oracle_solver(op_real, n_steps, order)

    def loss(solve):
        def f(th, y, a, b):
            yf = solve(th, y, a, b)
            return jnp.sum(yf ** 2) + yf[0]
        return f

    args = (theta, y0, jnp.asarray(0.3, jnp.float64),
            jnp.asarray(2.1, jnp.float64))
    v1 = loss(solver)(*args)
    v2 = loss(oracle)(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    g1 = jax.grad(loss(solver), argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(loss(oracle), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g1, g2, ["theta", "y0", "t0", "tf"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10,
            err_msg=f"{name} (order {order})",
        )


def test_forward_matches_magnus4_stepper():
    # the adjoint's discrete forward IS the Magnus4(DenseSplit()) map
    from vec_ode_tpu.exp import DenseSplit, Magnus4

    theta = jnp.asarray([1.1, 0.9], jnp.float64)
    y0 = jnp.asarray([0.7, -0.2], jnp.float64)
    n = 16
    yf = diff.adjoint_solve_dense(
        op_real, theta, y0, 0.0, 1.5, n, order=4
    )
    sol = vo.solve_linear(
        lambda t: op_real(t, theta), 0.0, 1.5, y0,
        stepper=Magnus4(DenseSplit()), adaptive=False, h0=1.5 / n,
    )
    np.testing.assert_allclose(
        np.asarray(yf), np.asarray(sol.y_final), rtol=1e-12
    )


def test_cplx_driven_qubit_grad_fd():
    # H(t) = sx + theta * cos(2t) * sz, A = -iH (Cplx); infidelity loss.
    sx = jnp.asarray([[0.0, 1.0], [1.0, 0.0]], jnp.float64)
    sz = jnp.asarray([[1.0, 0.0], [0.0, -1.0]], jnp.float64)

    def op(t, th):
        H = sx + th * jnp.cos(2.0 * t) * sz
        return Cplx(jnp.zeros_like(H), -H)

    y0 = Cplx(jnp.asarray([1.0, 0.0], jnp.float64),
              jnp.zeros(2, jnp.float64))

    def loss(th):
        yf = diff.adjoint_solve_dense(op, th, y0, 0.0, 2.0, 32, order=4)
        return 1.0 - (yf.re[1] ** 2 + yf.im[1] ** 2)

    th0 = jnp.asarray(0.6, jnp.float64)
    g = float(jax.grad(loss)(th0))
    eps = 1e-6
    fd = float((loss(th0 + eps) - loss(th0 - eps)) / (2 * eps))
    np.testing.assert_allclose(g, fd, rtol=1e-6, atol=1e-9)
    # unitarity of the propagated state (anti-Hermitian A)
    yf = diff.adjoint_solve_dense(op, th0, y0, 0.0, 2.0, 32, order=4)
    norm = float(jnp.sqrt(jnp.sum(yf.re ** 2 + yf.im ** 2)))
    np.testing.assert_allclose(norm, 1.0, atol=1e-10)


def test_batched_states_broadcast():
    theta = jnp.asarray([0.8, 1.7], jnp.float64)
    y0b = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.5, -0.5]], jnp.float64)
    solver = diff.make_adjoint_dense_solver(op_real, n_steps=12, order=4)
    yfb = solver(theta, y0b, 0.0, 1.0, )
    for i in range(3):
        yf1 = solver(theta, y0b[i], 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(yfb[i]), np.asarray(yf1),
                                   rtol=1e-12)

    # gradient of a batched loss
    def loss(th):
        return jnp.sum(solver(th, y0b, 0.0, 1.0) ** 2)

    g = jax.grad(loss)(theta)
    assert np.all(np.isfinite(np.asarray(g)))


def test_order_validation():
    with pytest.raises(ValueError):
        diff.make_adjoint_dense_solver(op_real, n_steps=4, order=3)
    with pytest.raises(ValueError):
        diff.make_adjoint_dense_solver(op_real, n_steps=4, anchor_every=0)


def op_dissipative(t, theta):
    # ANISOTROPIC damping (decay-rate spread 12 over T=2): uniform -g*I is
    # a scalar factor and reconstructs stably, but a spread makes e^{-Om}
    # expand the fast direction by e^{12*dt}, amplifying the roundoff
    # contamination of the decayed component by e^{12*T} ~ 2.6e10 over the
    # unanchored backward sweep (f64 eps -> ~1e-6 relative drift)
    S = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float64)
    N = jnp.asarray([[0.0, 1.0], [0.0, 0.0]], jnp.float64)
    D = jnp.asarray([[-12.0, 0.0], [0.0, 0.0]], jnp.float64)
    return theta[0] * S + jnp.sin(theta[1] * t) * N + D


@pytest.mark.parametrize("anchor_every", [1, 4, 7])
def test_anchored_gradient_dissipative(anchor_every):
    """anchor_every=k bounds the reconstruction drift for dissipative
    operators (diff.py:make_adjoint_dense_solver step 1): each backward
    segment re-anchors on a stored forward state, so the amplification is
    e^{2*gamma*k*dt} per segment instead of e^{2*gamma*T} overall."""
    n_steps = 24
    theta = jnp.asarray([0.8, 1.7], jnp.float64)
    y0 = jnp.asarray([1.0, 0.25], jnp.float64)
    args = (theta, y0, jnp.asarray(0.0, jnp.float64),
            jnp.asarray(2.0, jnp.float64))

    def loss(solve):
        def f(th, y, a, b):
            return jnp.sum(solve(th, y, a, b) ** 2)
        return f

    anchored = diff.make_adjoint_dense_solver(
        op_dissipative, n_steps=n_steps, order=4,
        anchor_every=anchor_every,
    )
    oracle = oracle_solver(op_dissipative, n_steps, 4)

    # forward value is segment-split but op-identical
    np.testing.assert_allclose(
        float(loss(anchored)(*args)), float(loss(oracle)(*args)),
        rtol=1e-12,
    )
    g1 = jax.grad(loss(anchored), argnums=(0, 1))(*args)
    g2 = jax.grad(loss(oracle), argnums=(0, 1))(*args)
    for a, b, name in zip(g1, g2, ["theta", "y0"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8,
            err_msg=f"{name} (anchor_every={anchor_every})",
        )


def test_unanchored_dissipative_drifts_more_than_anchored():
    """The anchoring exists for a reason: on the same damped system the
    plain O(1) sweep's theta-gradient error is orders of magnitude larger
    than the anchored one's."""
    n_steps = 24
    theta = jnp.asarray([0.8, 1.7], jnp.float64)
    y0 = jnp.asarray([1.0, 0.25], jnp.float64)
    args = (theta, y0, jnp.asarray(0.0, jnp.float64),
            jnp.asarray(2.0, jnp.float64))

    def loss(solve):
        def f(th, y, a, b):
            return jnp.sum(solve(th, y, a, b) ** 2)
        return f

    def err(solver):
        g = jax.grad(loss(solver))(*args)
        g_ref = jax.grad(loss(oracle_solver(op_dissipative, n_steps, 4))
                         )(*args)
        return float(jnp.linalg.norm(g - g_ref) / jnp.linalg.norm(g_ref))

    e_plain = err(diff.make_adjoint_dense_solver(
        op_dissipative, n_steps=n_steps, order=4))
    e_anch = err(diff.make_adjoint_dense_solver(
        op_dissipative, n_steps=n_steps, order=4, anchor_every=2))
    assert e_anch < 1e-9, e_anch
    assert e_plain > 100 * max(e_anch, 1e-14), (e_plain, e_anch)
