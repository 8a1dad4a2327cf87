"""On-device optimizer loops (diff.fit_loop / make_fit_loop).

The reference's user contract is a HOST loop around the solver
(/root/reference/src/impls/nalgebra.rs:61-64); fit_loop converts the whole
optimization (value_and_grad + optax update, N iterations) into ONE jitted
dispatch. These tests pin:
  * exact equivalence with the host loop it replaces (same optimizer, same
    iterate sequence),
  * early-stopping (tol) semantics: dynamic n_done, NaN tail, one dispatch,
  * has_aux / extra-args passthrough,
  * the flagship composition: adjoint_solve inside the loss, optimized
    end-to-end on-device (the pulse-control example's core).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vec_ode_tpu.diff import FitResult, fit_loop, make_fit_loop


def _quad(th):
    return jnp.sum((th - 3.0) ** 2)


def test_matches_host_loop_exactly():
    opt = optax.adam(0.2)
    theta = jnp.zeros(4)
    res = fit_loop(_quad, theta, optimizer=opt, n_iters=40)

    # the host loop fit_loop replaces, same ops in the same order
    vg = jax.value_and_grad(_quad)
    st = opt.init(theta)
    losses = []
    for _ in range(40):
        v, g = vg(theta)
        losses.append(v)
        up, st = opt.update(g, st, theta)
        theta = jax.tree_util.tree_map(lambda p, u: p + u.astype(p.dtype),
                                       theta, up)
    np.testing.assert_allclose(res.params, theta, rtol=1e-12)
    np.testing.assert_allclose(res.losses, jnp.stack(losses), rtol=1e-12)
    assert int(res.n_done) == 40
    assert res.aux is None


def test_losses_are_pre_update():
    res = fit_loop(_quad, jnp.zeros(4), optimizer=optax.sgd(0.1), n_iters=5)
    # losses[0] is the loss at theta0
    assert float(res.losses[0]) == pytest.approx(4 * 9.0)


def test_tol_early_stop():
    res = fit_loop(_quad, jnp.zeros(4), optimizer=optax.adam(0.2),
                   n_iters=500, tol=1e-10)
    n = int(res.n_done)
    assert 0 < n < 500
    assert float(res.losses[n - 1]) <= 1e-10
    assert float(res.losses[n - 2]) > 1e-10
    assert bool(jnp.all(jnp.isnan(res.losses[n:])))
    assert res.losses.shape == (500,)  # static shape


def test_tol_never_reached_runs_all_iters():
    res = fit_loop(_quad, jnp.zeros(2), optimizer=optax.sgd(1e-4),
                   n_iters=10, tol=1e-30)
    assert int(res.n_done) == 10
    assert not bool(jnp.any(jnp.isnan(res.losses)))


def test_has_aux_and_extra_args():
    def loss(th, data, w):
        r = jnp.sum(w * (th - data) ** 2)
        return r, {"twice": 2.0 * r}

    data = jnp.asarray([1.0, 2.0, 3.0])
    w = jnp.asarray([1.0, 0.5, 2.0])
    res = fit_loop(loss, jnp.zeros(3), data, w, optimizer=optax.adam(0.3),
                   n_iters=120, has_aux=True)
    np.testing.assert_allclose(res.params, data, atol=1e-2)
    assert res.aux["twice"].shape == (120,)
    np.testing.assert_allclose(res.aux["twice"], 2.0 * res.losses,
                               rtol=1e-12)


def test_pytree_params():
    def loss(th):
        return jnp.sum((th["a"] - 1.0) ** 2) + jnp.sum((th["b"] + 2.0) ** 2)

    res = fit_loop(loss, {"a": jnp.zeros(2), "b": jnp.zeros((2, 2))},
                   optimizer=optax.adam(0.1), n_iters=300)
    np.testing.assert_allclose(res.params["a"], 1.0, atol=1e-3)
    np.testing.assert_allclose(res.params["b"], -2.0, atol=1e-3)


def test_factory_reuse_no_retrace():
    fit = make_fit_loop(_quad, optax.adam(0.2), n_iters=20)
    r1 = fit(jnp.zeros(4))
    r2 = fit(jnp.ones(4))
    assert isinstance(r1, FitResult)
    assert float(r2.losses[0]) == pytest.approx(4 * 4.0)
    # jitted callable: second call with same shapes reuses the trace
    assert fit._cache_size() == 1


def test_n_iters_validation():
    with pytest.raises(ValueError, match="n_iters"):
        make_fit_loop(_quad, optax.sgd(0.1), n_iters=0)


def test_single_dispatch_jit_boundary():
    # the whole loop must be ONE compiled computation: trace-count the
    # loss via a side counter that only increments at trace time
    count = {"n": 0}

    def loss(th):
        count["n"] += 1
        return jnp.sum(th * th)

    fit = make_fit_loop(loss, optax.sgd(0.1), n_iters=50)
    fit(jnp.ones(3))
    # scan traces the body a bounded number of times (trace + lowering
    # passes), never 50
    assert count["n"] <= 4


def test_adjoint_solve_inside_loop():
    # the pulse-control composition: O(1)-memory adjoint inside the
    # on-device optimizer loop, end-to-end on the CPU backend
    from vec_ode_tpu.models import PulseControl
    from vec_ode_tpu.ops import cplx as cp

    pc = PulseControl.make(d=4, seed=0, T=5.0, n_modes=6)
    psi0 = cp.from_complex(np.eye(4)[0][None].astype(complex), jnp.float64)
    tgt = cp.from_complex(np.eye(4)[2][None].astype(complex), jnp.float64)
    theta0 = 0.1 * jnp.ones(6, jnp.float64)

    res = fit_loop(
        lambda th: pc.infidelity(th, psi0, tgt, n_steps=48),
        theta0, optimizer=optax.adam(0.3), n_iters=30)
    assert float(res.losses[-1]) < 0.5 * float(res.losses[0])
    assert np.isfinite(np.asarray(res.losses)).all()
