"""Modulated-operator fast path (exp/modulated.py): shared-basis Taylor
propagator actions must match the generic dense-split solvers.

Generic semantics under test: magnus.rs:10-26 (midpoint), magnus.rs:28-83
(Magnus-4), cfm.rs:43-100 (CFM) — already validated for the dense splits in
test_exp_solvers.py; here the modulated path is compared against those.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.exp.modulated import ModulatedOperator, modulated_exp_apply
from vec_ode_tpu.models import DrivenDense, LandauZener
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.ops.expm import expm
from vec_ode_tpu.parallel import ensemble_solve


def _psi0(d, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal(d) + 1j * rng.standard_normal(d)
    z /= np.linalg.norm(z)
    return cp.from_complex(z, dtype)


def test_exp_apply_matches_expm():
    """modulated_exp_apply == expm(sum c_k M_k) @ x for random real basis."""
    rng = np.random.default_rng(3)
    K, D = 3, 16
    basis = jnp.asarray(rng.standard_normal((K, D, D)) * 0.4)
    coeffs = jnp.asarray(rng.standard_normal((5, K)))
    x = jnp.asarray(rng.standard_normal((5, D)))

    y = modulated_exp_apply(basis, coeffs, x)
    A = jnp.einsum("lk,kij->lij", coeffs, basis)
    y_ref = jnp.einsum("lij,lj->li", expm(A), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-12, atol=1e-12)


def test_exp_apply_large_norm_scaling():
    """Squaring path: ||A|| >> theta still accurate (batch-uniform s)."""
    rng = np.random.default_rng(4)
    D = 8
    basis = jnp.asarray(rng.standard_normal((2, D, D)))
    coeffs = jnp.asarray([[3.0, -2.0]])
    x = jnp.asarray(rng.standard_normal((1, D)))
    y = modulated_exp_apply(basis, coeffs, x)
    A = jnp.einsum("lk,kij->lij", coeffs, basis)
    y_ref = jnp.einsum("lij,lj->li", expm(A), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-10, atol=1e-10)


def test_exp_apply_zero_dt_is_identity():
    rng = np.random.default_rng(5)
    basis = jnp.asarray(rng.standard_normal((2, 6, 6)))
    x = jnp.asarray(rng.standard_normal((6,)))
    y = modulated_exp_apply(basis, jnp.zeros((2,)), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=0)


def _driven_setup(d=8, dtype=jnp.float64):
    model = DrivenDense.make(d=d, seed=0)
    mod = model.modulated(dtype)
    op_fn = lambda t: model.op_pair(t, dtype)
    return model, mod, op_fn


def test_modulated_assemble_matches_dense():
    _, mod, op_fn = _driven_setup()
    for t in (0.0, 0.37, 1.9):
        A_mod = mod.assemble(jnp.asarray(t, jnp.float64))
        A_ref = op_fn(t)
        np.testing.assert_allclose(np.asarray(A_mod.re), np.asarray(A_ref.re),
                                   atol=1e-14)
        np.testing.assert_allclose(np.asarray(A_mod.im), np.asarray(A_ref.im),
                                   atol=1e-14)


@pytest.mark.parametrize("make_pair", [
    lambda mod, op_fn: (
        vexp.MidpointModulated(mod),
        vexp.ExpMidpoint(vexp.DenseCplxSplit()),
        False,
    ),
    lambda mod, op_fn: (
        vexp.MagnusModulated4(mod),
        vexp.Magnus4(vexp.DenseCplxSplit()),
        True,
    ),
    lambda mod, op_fn: (
        vexp.CFM4Modulated(mod),
        vexp.CFM4(vexp.DenseCplxSplit()),
        True,
    ),
    lambda mod, op_fn: (
        vexp.MagnusModulated6(mod),
        vexp.Magnus6(vexp.DenseCplxSplit()),
        True,
    ),
])
def test_modulated_matches_generic_trajectory(make_pair):
    """Full adaptive/fixed solve: modulated stepper == generic dense-split
    stepper on the same driven Hamiltonian (identical step sequences in
    f64)."""
    _, mod, op_fn = _driven_setup()
    st_mod, st_gen, adaptive = make_pair(mod, op_fn)
    psi0 = _psi0(8)
    ctl = vo.StepControl(rtol=1e-7, min_dt=1e-6, max_dt=0.3)

    sol_m = vo.solve_linear(None, 0.0, 1.5, psi0, stepper=st_mod,
                            adaptive=adaptive, ctl=ctl, h0=1e-2)
    sol_g = vo.solve_linear(op_fn, 0.0, 1.5, psi0, stepper=st_gen,
                            adaptive=adaptive, ctl=ctl, h0=1e-2)

    assert int(sol_m.status) == vo.DONE and int(sol_g.status) == vo.DONE
    assert int(sol_m.n_accept) == int(sol_g.n_accept)
    assert int(sol_m.n_reject) == int(sol_g.n_reject)
    np.testing.assert_allclose(np.asarray(sol_m.y_final.re),
                               np.asarray(sol_g.y_final.re),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol_m.y_final.im),
                               np.asarray(sol_g.y_final.im),
                               rtol=1e-9, atol=1e-9)


def test_magnus_modulated_fixed_step_order4():
    """Global error slope ~4 for fixed-step MagnusModulated4."""
    _, mod, op_fn = _driven_setup()
    psi0 = _psi0(8, seed=1)
    st = vexp.MagnusModulated4(mod, adaptive=False)

    ref = vo.solve_linear(None, 0.0, 1.0, psi0, stepper=st,
                          adaptive=False, h0=1.0 / 512,
                          ctl=vo.StepControl(max_steps=4000))
    errs = []
    hs = [1.0 / 8, 1.0 / 16, 1.0 / 32]
    for h in hs:
        s = vo.solve_linear(None, 0.0, 1.0, psi0, stepper=st,
                            adaptive=False, h0=h,
                            ctl=vo.StepControl(max_steps=4000))
        d = np.linalg.norm(
            np.asarray(s.y_final.re - ref.y_final.re)
            + 1j * np.asarray(s.y_final.im - ref.y_final.im)
        )
        errs.append(d)
    slopes = np.diff(np.log(errs)) / np.diff(np.log(hs))
    assert slopes.mean() > 3.5, (errs, slopes)


def test_magnus_modulated_unitarity():
    _, mod, _ = _driven_setup(d=8)
    psi0 = _psi0(8, seed=2)
    sol = vo.solve_linear(None, 0.0, 4.0, psi0,
                          stepper=vexp.MagnusModulated4(mod), adaptive=True,
                          ctl=vo.StepControl(rtol=1e-8, max_dt=0.5))
    n = float(jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2)))
    assert int(sol.status) == vo.DONE
    assert abs(n - 1.0) < 1e-8


def test_landau_zener_modulated_transition():
    """Golden physics: LZ transition probability via the modulated path."""
    lz = LandauZener(v=2.0, delta=0.4)
    mod = lz.modulated(jnp.float64)
    psi0 = cp.Cplx(jnp.asarray([1.0, 0.0], jnp.float64),
                   jnp.zeros(2, jnp.float64))
    sol = vo.solve_linear(None, -25.0, 25.0, psi0,
                          stepper=vexp.MagnusModulated4(mod), adaptive=True,
                          ctl=vo.StepControl(rtol=1e-9, min_dt=1e-6,
                                             max_dt=0.5, max_steps=100000))
    assert int(sol.status) == vo.DONE
    p_stay = float(sol.y_final.re[0] ** 2 + sol.y_final.im[0] ** 2)
    assert abs(p_stay - lz.p_transition) < 5e-3, (p_stay, lz.p_transition)


def test_modulated_ensemble_vmap_and_mesh():
    """Ensemble of driven trajectories under vmap + 8-device mesh matches
    per-trajectory solves."""
    from vec_ode_tpu.parallel import ensemble_mesh, shard_batch

    model, mod, op_fn = _driven_setup(d=8, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    z = rng.standard_normal((16, 8)) + 1j * rng.standard_normal((16, 8))
    z /= np.linalg.norm(z, axis=-1, keepdims=True)
    y0 = cp.from_complex(z, jnp.float32)
    ctl = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.3)
    st = vexp.MagnusModulated4(mod)

    mesh = ensemble_mesh(8)
    sol = ensemble_solve(None, shard_batch(y0, mesh), 0.0, 0.5,
                         stepper=st, ctl=ctl, h0=1e-2,
                         time_dtype=jnp.float32, mesh=mesh)
    assert (np.asarray(sol.status) == vo.DONE).all()

    one = vo.solve_linear(
        None, 0.0, 0.5,
        cp.Cplx(y0.re[3], y0.im[3]), stepper=st, adaptive=True,
        ctl=ctl, h0=1e-2, time_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(sol.y_final.re[3]),
                               np.asarray(one.y_final.re),
                               rtol=2e-5, atol=2e-5)


def test_real_modulated_operator():
    """Plain-real basis (no Cplx): damped driven linear system."""
    rng = np.random.default_rng(9)
    d = 6
    M0 = jnp.asarray(-np.eye(d) - 0.2 * rng.standard_normal((d, d)))
    M1 = jnp.asarray(0.3 * rng.standard_normal((d, d)))
    mod = ModulatedOperator(
        basis=jnp.stack([M0, M1]),
        coeff_fn=lambda t: jnp.stack(
            [jnp.ones_like(jnp.asarray(t, jnp.float64)),
             jnp.sin(jnp.asarray(t, jnp.float64))]
        ),
    )
    y0 = jnp.asarray(rng.standard_normal(d))
    sol = vo.solve_linear(None, 0.0, 2.0, y0,
                          stepper=vexp.MagnusModulated4(mod), adaptive=True,
                          ctl=vo.StepControl(rtol=1e-8, max_dt=0.25))
    # reference: generic Magnus4 on DenseSplit with assembled operator
    sol_ref = vo.solve_linear(
        mod.assemble, 0.0, 2.0, y0,
        stepper=vexp.Magnus4(vexp.DenseSplit()), adaptive=True,
        ctl=vo.StepControl(rtol=1e-8, max_dt=0.25),
    )
    assert int(sol.status) == vo.DONE
    np.testing.assert_allclose(np.asarray(sol.y_final),
                               np.asarray(sol_ref.y_final),
                               rtol=1e-8, atol=1e-10)


def test_chain_kernel_interpret_matches_expm():
    """Pallas chain kernel (interpret mode, in-kernel scaling) vs direct
    expm composition, plus the XLA reference path."""
    from vec_ode_tpu.ops.pallas_expmv import (
        chain_expmv_pallas,
        chain_expmv_xla,
    )

    rng = np.random.default_rng(11)
    B, D, C, R, K = 16, 128, 2, 2, 3
    basis = jnp.asarray(rng.standard_normal((K, D, D)) * 0.02, jnp.float32)
    chains = jnp.asarray(rng.standard_normal((B, C, R, K)) * 0.6, jnp.float32)
    xw = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    (y_k,), e_k = chain_expmv_pallas(chains, (xw,), basis, m=8, theta=0.35,
                                     tile=8, interpret=True)

    # direct expm composition in f64 (per chain, unscaled)
    A = jnp.einsum("bcrk,kij->bcrij", chains.astype(jnp.float64),
                   basis.astype(jnp.float64))
    x64 = xw.astype(jnp.float64)
    ys = []
    for c in range(C):
        v = x64
        for r in range(R):
            v = jnp.einsum("bij,bj->bi", expm(A[:, c, r]), v)
        ys.append(v)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(ys[0]),
                               rtol=3e-4, atol=3e-4)
    e_direct = np.linalg.norm(np.asarray(ys[1] - ys[0]), axis=-1)
    np.testing.assert_allclose(np.asarray(e_k), e_direct,
                               rtol=3e-3, atol=3e-5)

    # XLA reference path (pre-scaled, uniform n_pass) agrees too
    y_ref, e_ref = chain_expmv_xla(chains / 4.0, jnp.asarray(4, jnp.int32),
                                   xw, basis, m=8)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(ys[0]),
                               rtol=3e-4, atol=3e-4)


def test_magnus_modulated_pallas_interpret_matches_xla_step():
    """Full Magnus-modulated step: Pallas(interpret) == XLA fallback."""
    _, mod, _ = _driven_setup(d=64, dtype=jnp.float32)
    rng = np.random.default_rng(12)
    B = 16
    z = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    y0 = cp.from_complex(z, jnp.float32)
    t = jnp.full((B,), 0.3, jnp.float32)
    dt = jnp.full((B,), 0.04, jnp.float32)

    st_x = vexp.MagnusModulated4(mod, use_pallas=False)
    xf_x, e_x = st_x.make_step_fn()(t, y0, dt)

    # force the pallas path in interpret mode (runs on CPU); make_step_fn
    # gates on the backend, so stub it while building the step
    st_p = vexp.MagnusModulated4(mod, interpret=True)
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        step = st_p.make_step_fn()
    finally:
        jax.default_backend = orig
    xf_p, e_p = step(t, y0, dt)

    np.testing.assert_allclose(np.asarray(xf_p.re), np.asarray(xf_x.re),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(xf_p.im), np.asarray(xf_x.im),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=2e-3, atol=2e-7)


class TestFusedLoop:
    """Whole-loop on-chip integration (ops/pallas_loop.py), interpret mode:
    must reproduce the XLA driver's statuses, counters and trajectories."""

    def _setup(self, B=16, d=64):
        model = DrivenDense.make(d=d, seed=0)
        mod = model.modulated(jnp.float32)
        rng = np.random.default_rng(21)
        z = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
        z /= np.linalg.norm(z, axis=-1, keepdims=True)
        y0 = cp.from_complex(z, jnp.float32)
        from vec_ode_tpu.driver import make_grid

        t_grid = make_grid(jnp.float32(0.0), jnp.float32(0.5),
                           dtype=jnp.float32)
        return mod, y0, t_grid

    def _run_fused(self, stepper, y0, t_grid, ctl, adaptive):
        orig = jax.default_backend
        try:
            jax.default_backend = lambda: "tpu"
            return stepper.fused_loop_solve(y0, t_grid, 1e-2, ctl=ctl,
                                            adaptive=adaptive)
        finally:
            jax.default_backend = orig

    @pytest.mark.parametrize("make", [
        lambda mod: (vexp.MagnusModulated4(mod, interpret=True),
                     vexp.MagnusModulated4(mod, use_pallas=False), True),
        lambda mod: (vexp.CFM4Modulated(mod, interpret=True),
                     vexp.CFM4Modulated(mod, use_pallas=False), True),
        lambda mod: (vexp.MidpointModulated(mod, interpret=True),
                     vexp.MidpointModulated(mod, use_pallas=False), False),
        lambda mod: (vexp.MagnusModulated6(mod, interpret=True),
                     vexp.MagnusModulated6(mod, use_pallas=False), True),
    ])
    def test_matches_xla_driver(self, make):
        mod, y0, t_grid = self._setup()
        st_f, st_x, adaptive = make(mod)
        ctl = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.2,
                             max_steps=500)

        sol_f = self._run_fused(st_f, y0, t_grid, ctl, adaptive)
        assert sol_f is not None, "fused loop did not engage"

        from vec_ode_tpu.driver import integrate

        sol_x = integrate(
            st_x.make_step_fn(), y0, t_grid,
            1e-2 if adaptive else 1e-2,
            adaptive=adaptive, ctl=ctl,
            error_norm=st_x.error_norm, batch_shape=(y0.re.shape[0],),
        )
        assert (np.asarray(sol_f.status) == vo.DONE).all()
        assert (np.asarray(sol_x.status) == vo.DONE).all()
        a_f, a_x = np.asarray(sol_f.n_accept), np.asarray(sol_x.n_accept)
        # controller uses exp(log(f)/order) in-kernel vs power() in XLA:
        # marginal accepts may flip on a few trajectories
        assert (a_f == a_x).mean() > 0.8, (a_f, a_x)
        np.testing.assert_allclose(np.asarray(sol_f.y_final.re),
                                   np.asarray(sol_x.y_final.re),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sol_f.y_final.im),
                                   np.asarray(sol_x.y_final.im),
                                   rtol=1e-4, atol=1e-4)
        # ys = [x0, x_final]
        np.testing.assert_allclose(np.asarray(sol_f.ys.re[:, 0]),
                                   np.asarray(y0.re), atol=0)
        np.testing.assert_allclose(np.asarray(sol_f.ys.re[:, 1]),
                                   np.asarray(sol_f.y_final.re), atol=0)

    def test_pi_controller_matches_xla_driver(self):
        """Opt-in PI (Gustafsson) control now runs IN-KERNEL: statuses,
        trajectories, and (mostly) accept counts must match the XLA driver
        with the same ctl.pi configuration."""
        mod, y0, t_grid = self._setup()
        ctl = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.2,
                             max_steps=500, pi=True, pi_order=4.0)
        st_f = vexp.MagnusModulated4(mod, interpret=True)
        sol_f = self._run_fused(st_f, y0, t_grid, ctl, True)
        assert sol_f is not None, "fused loop did not engage with ctl.pi"

        from vec_ode_tpu.driver import integrate

        st_x = vexp.MagnusModulated4(mod, use_pallas=False)
        sol_x = integrate(
            st_x.make_step_fn(), y0, t_grid, 1e-2, adaptive=True, ctl=ctl,
            error_norm=st_x.error_norm, batch_shape=(y0.re.shape[0],),
        )
        assert (np.asarray(sol_f.status) == vo.DONE).all()
        a_f, a_x = np.asarray(sol_f.n_accept), np.asarray(sol_x.n_accept)
        # exp(log)/power marginal flips, as in test_matches_xla_driver
        assert (a_f == a_x).mean() > 0.8, (a_f, a_x)
        np.testing.assert_allclose(np.asarray(sol_f.y_final.re),
                                   np.asarray(sol_x.y_final.re),
                                   rtol=1e-4, atol=1e-4)
        # PI control must actually differ from the I controller
        ctl_i = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.2,
                               max_steps=500)
        sol_i = self._run_fused(st_f, y0, t_grid, ctl_i, True)
        assert (np.asarray(sol_i.n_accept) != a_f).any()

    def test_strict_end_test_in_kernel(self):
        """strict_end_test (the reference's unscaled eps end test) is now
        kernel-eligible; for |t| ~ 1 it is behaviorally identical to the
        default scaled test (see controller.end_tolerance) — results must
        be bit-identical."""
        mod, y0, t_grid = self._setup()
        st = vexp.MagnusModulated4(mod, interpret=True)
        base = dict(rtol=1e-4, min_dt=1e-5, max_dt=0.2, max_steps=500)
        sol_s = self._run_fused(st, y0, t_grid,
                                vo.StepControl(strict_end_test=True, **base),
                                True)
        sol_d = self._run_fused(st, y0, t_grid, vo.StepControl(**base), True)
        assert sol_s is not None
        assert (np.asarray(sol_s.status) == vo.DONE).all()
        np.testing.assert_array_equal(np.asarray(sol_s.n_accept),
                                      np.asarray(sol_d.n_accept))
        np.testing.assert_array_equal(np.asarray(sol_s.y_final.re),
                                      np.asarray(sol_d.y_final.re))

    def test_scaled_error_in_kernel(self):
        """ctl.scaled_error engages the fused loop (scaling lives in the
        step builder, which holds the error vector). Oracle: hand-scaled
        controller semantics — with states on the unit sphere, scaled_error
        at (atol ~ 0, rtol) behaves like the plain norm at measure/rtol'
        where the scale is ~ rtol*|x|; we check statuses, step-count
        plausibility, and accuracy against the unscaled solve."""
        mod, y0, t_grid = self._setup()
        st = vexp.MagnusModulated4(mod, interpret=True)
        ctl_s = vo.StepControl(rtol=1e-4, atol=1e-10, scaled_error=True,
                               min_dt=1e-5, max_dt=0.2, max_steps=500)
        sol_s = self._run_fused(st, y0, t_grid, ctl_s, True)
        assert sol_s is not None, "fused loop did not engage with scaled"
        assert (np.asarray(sol_s.status) == vo.DONE).all()
        ctl_u = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.2,
                               max_steps=500)
        sol_u = self._run_fused(st, y0, t_grid, ctl_u, True)
        # |psi| = 1 per trajectory => per-component scale ~ rtol*|x_i| makes
        # the scaled measure STRICTER than the raw norm here (mean |x_i| =
        # 1/sqrt(d) < 1): more steps, and an accurate trajectory
        assert (np.asarray(sol_s.n_accept) >= np.asarray(sol_u.n_accept)).all()
        np.testing.assert_allclose(np.asarray(sol_s.y_final.re),
                                   np.asarray(sol_u.y_final.re),
                                   rtol=2e-4, atol=2e-4)

    def test_scaled_error_xla_fallback_raises(self):
        """When the fused loop cannot engage, scaled_error with a
        norm-returning stepper must raise the dedicated error, not a
        tree-structure crash."""
        from vec_ode_tpu.parallel import ensemble_solve

        mod, y0, _ = self._setup()
        st = vexp.MagnusModulated4(mod, use_pallas=False)  # never engages
        with pytest.raises(ValueError, match="norm-returning stepper"):
            ensemble_solve(
                None, y0, 0.0, 0.5, stepper=st, adaptive=True,
                ctl=vo.StepControl(rtol=1e-4, scaled_error=True,
                                   min_dt=1e-5, max_dt=0.2),
                h0=1e-2, time_dtype=jnp.float32,
            )

    def test_persistent_matches_chunked(self):
        """The persistent (single-launch, in-kernel while) loop and the
        chunked (XLA while of 8-iteration kernels) loop share the iteration
        body — results must be bit-identical, including counters."""
        mod, y0, t_grid = self._setup()
        st = vexp.MagnusModulated4(mod, interpret=True)
        ctl = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.2,
                             max_steps=500)
        orig = jax.default_backend
        try:
            jax.default_backend = lambda: "tpu"
            sol_p = st.fused_loop_solve(y0, t_grid, 1e-2, ctl=ctl,
                                        adaptive=True, persistent=True)
            sol_c = st.fused_loop_solve(y0, t_grid, 1e-2, ctl=ctl,
                                        adaptive=True, persistent=False)
        finally:
            jax.default_backend = orig
        assert sol_p is not None and sol_c is not None
        for name in ("status", "n_accept", "n_reject", "n_iters"):
            np.testing.assert_array_equal(
                np.asarray(getattr(sol_p, name)),
                np.asarray(getattr(sol_c, name)), err_msg=name)
        np.testing.assert_array_equal(np.asarray(sol_p.t_final),
                                      np.asarray(sol_c.t_final))
        np.testing.assert_array_equal(np.asarray(sol_p.y_final.re),
                                      np.asarray(sol_c.y_final.re))
        np.testing.assert_array_equal(np.asarray(sol_p.y_final.im),
                                      np.asarray(sol_c.y_final.im))

    def test_max_steps_status(self):
        mod, y0, t_grid = self._setup()
        st = vexp.MagnusModulated4(mod, interpret=True)
        ctl = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.2, max_steps=5)
        sol = self._run_fused(st, y0, t_grid, ctl, True)
        assert sol is not None
        assert (np.asarray(sol.status) == vo.ERR_MAX_STEPS).all()
        assert (np.asarray(sol.n_iters) >= 5).all()
        # unfinished: ys[1] stays zero (same as the XLA driver's buffer)
        assert (np.asarray(sol.ys.re[:, 1]) == 0).all()

    def test_interior_save_grid_matches_xla_driver(self):
        """save_at grids are hit exactly and recorded IN-KERNEL; the
        recorded states must match the XLA driver's ys."""
        mod, y0, _ = self._setup()
        from vec_ode_tpu.driver import integrate, make_grid

        g3 = make_grid(jnp.float32(0.0), jnp.float32(0.5),
                       save_at=jnp.asarray([0.17, 0.33], jnp.float32),
                       dtype=jnp.float32)
        ctl = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.2,
                             max_steps=500)
        st_f = vexp.MagnusModulated4(mod, interpret=True)
        sol_f = self._run_fused(st_f, y0, g3, ctl, True)
        assert sol_f is not None, "fused loop did not engage on save grid"

        st_x = vexp.MagnusModulated4(mod, use_pallas=False)
        sol_x = integrate(
            st_x.make_step_fn(), y0, g3, 1e-2, adaptive=True, ctl=ctl,
            error_norm=st_x.error_norm, batch_shape=(y0.re.shape[0],),
        )
        assert (np.asarray(sol_f.status) == vo.DONE).all()
        assert (np.asarray(sol_x.status) == vo.DONE).all()
        assert sol_f.ys.re.shape[1] == 4
        np.testing.assert_allclose(np.asarray(sol_f.ys.re),
                                   np.asarray(sol_x.ys.re),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sol_f.ys.im),
                                   np.asarray(sol_x.ys.im),
                                   rtol=1e-4, atol=1e-4)
        # grid-hit bookkeeping matches too (tgt cursor consumed the grid)
        np.testing.assert_array_equal(np.asarray(sol_f.n_iters),
                                      np.asarray(sol_x.n_iters))

    def test_ineligible_configs_fall_back(self):
        mod, y0, t_grid = self._setup()
        st = vexp.MagnusModulated4(mod, interpret=True)
        ctl = vo.StepControl(rtol=1e-4)
        # (PI / scaled_error / strict_end_test are now ELIGIBLE — covered
        # by the dedicated tests above)
        # LARGE interior save grids became ELIGIBLE in r5 (windowed
        # persistent launches, pallas_loop._windowed_persistent); only a
        # grid beyond the 1026-point windowing cap still falls back
        from vec_ode_tpu.driver import make_grid

        g_big = make_grid(
            jnp.float32(0), jnp.float32(0.5),
            save_at=jnp.asarray(np.linspace(0.04, 0.46, 40), jnp.float32),
            dtype=jnp.float32)
        assert self._run_fused(st, y0, g_big, ctl, True) is not None
        g_huge = make_grid(
            jnp.float32(0), jnp.float32(0.5),
            save_at=jnp.asarray(np.linspace(0.04, 0.46, 1060),
                                jnp.float32),
            dtype=jnp.float32)
        assert self._run_fused(st, y0, g_huge, ctl, True) is None
        # scalar (unbatched) state -> not eligible
        y0s = cp.Cplx(y0.re[0], y0.im[0])
        assert self._run_fused(st, y0s, t_grid, ctl, True) is None


def test_magnus_modulated6_fixed_step_order6():
    """Global error slope ~6 for fixed-step MagnusModulated6."""
    _, mod, op_fn = _driven_setup()
    psi0 = _psi0(8, seed=1)
    st = vexp.MagnusModulated6(mod, adaptive=False)

    ref = vo.solve_linear(None, 0.0, 1.0, psi0, stepper=st,
                          adaptive=False, h0=1.0 / 128,
                          ctl=vo.StepControl(max_steps=4000))
    errs = []
    hs = [1.0 / 4, 1.0 / 8, 1.0 / 16]
    for h in hs:
        s = vo.solve_linear(None, 0.0, 1.0, psi0, stepper=st,
                            adaptive=False, h0=h,
                            ctl=vo.StepControl(max_steps=4000))
        d = np.linalg.norm(
            np.asarray(s.y_final.re - ref.y_final.re)
            + 1j * np.asarray(s.y_final.im - ref.y_final.im)
        )
        errs.append(d)
    slopes = np.diff(np.log(errs)) / np.diff(np.log(hs))
    assert slopes.mean() > 5.4, (errs, slopes)


def test_magnus_modulated6_pallas_interpret_matches_xla_step():
    """Full Magnus-6 modulated step: Pallas(interpret) == XLA fallback."""
    _, mod, _ = _driven_setup(d=64, dtype=jnp.float32)
    rng = np.random.default_rng(12)
    B = 16
    z = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    y0 = cp.from_complex(z, jnp.float32)
    t = jnp.full((B,), 0.3, jnp.float32)
    dt = jnp.full((B,), 0.04, jnp.float32)

    st_x = vexp.MagnusModulated6(mod, use_pallas=False)
    xf_x, e_x = st_x.make_step_fn()(t, y0, dt)

    st_p = vexp.MagnusModulated6(mod, interpret=True)
    orig = jax.default_backend
    try:
        jax.default_backend = lambda: "tpu"
        step = st_p.make_step_fn()
    finally:
        jax.default_backend = orig
    xf_p, e_p = step(t, y0, dt)

    np.testing.assert_allclose(np.asarray(xf_p.re), np.asarray(xf_x.re),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(xf_p.im), np.asarray(xf_x.im),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x),
                               rtol=2e-3, atol=2e-7)


# ------------------------------------------------------------- Lindblad --
def test_lindblad_amplitude_damping_closed_form():
    """Open-system capability: single-qubit amplitude damping has the
    closed form rho_ee(t) = e^{-gt} rho_ee(0), rho_ge(t) = e^{-gt/2}
    rho_ge(0); the modulated superoperator solve must reproduce it."""
    from vec_ode_tpu.models.quantum import Lindblad

    g = 0.7
    L = np.array([[0.0, 1.0], [0.0, 0.0]], complex)   # |g><e|
    lb = Lindblad(H0=np.zeros((2, 2), complex),
                  Hc=np.zeros((2, 2), complex), jumps=((g, L),))
    mod = lb.modulated(lambda t: jnp.zeros_like(jnp.asarray(t)))

    rho0 = np.array([[0.4, 0.2 - 0.1j], [0.2 + 0.1j, 0.6]])
    v0 = Lindblad.vec_rho(rho0[None])
    T = 1.3
    sol = vo.solve_linear(None, 0.0, T, v0,
                          stepper=vexp.MagnusModulated4(mod), adaptive=True,
                          ctl=vo.StepControl(rtol=1e-10, atol=1e-12,
                                             min_dt=1e-8, max_dt=0.2))
    assert int(sol.status) == vo.DONE
    rho = Lindblad.unvec_rho(sol.y_final)[0]
    np.testing.assert_allclose(rho[1, 1], 0.6 * np.exp(-g * T), atol=1e-9)
    np.testing.assert_allclose(rho[0, 0], 1.0 - 0.6 * np.exp(-g * T),
                               atol=1e-9)
    np.testing.assert_allclose(rho[0, 1],
                               (0.2 - 0.1j) * np.exp(-g * T / 2),
                               atol=1e-9)
    np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-10)


def test_lindblad_driven_trace_preserving_and_matches_expm():
    """Driven dissipative qudit: trace stays 1 through the adaptive solve
    and the terminal state matches a fine-step dense-superoperator expm
    reference."""
    from vec_ode_tpu.models.quantum import Lindblad
    from vec_ode_tpu.ops.expm import expm as dense_expm

    d = 3
    lb = Lindblad.make(d=d, seed=9, gamma=0.25)
    u_fn = lambda t: 0.8 * jnp.sin(2.1 * jnp.asarray(t))
    mod = lb.modulated(u_fn)

    rho0 = np.zeros((d, d), complex)
    rho0[d - 1, d - 1] = 1.0                           # excited state
    v0 = Lindblad.vec_rho(rho0[None])
    T = 1.0
    sol = vo.solve_linear(None, 0.0, T, v0,
                          stepper=vexp.MagnusModulated4(mod), adaptive=True,
                          ctl=vo.StepControl(rtol=1e-9, atol=1e-11,
                                             min_dt=1e-8, max_dt=0.1))
    assert int(sol.status) == vo.DONE
    rho = Lindblad.unvec_rho(sol.y_final)[0]
    np.testing.assert_allclose(np.trace(rho).real, 1.0, atol=1e-8)
    np.testing.assert_allclose(np.trace(rho).imag, 0.0, atol=1e-10)
    # Hermiticity and positivity (physical state)
    np.testing.assert_allclose(rho, rho.conj().T, atol=1e-8)
    assert np.linalg.eigvalsh((rho + rho.conj().T) / 2).min() > -1e-8

    # fine-step piecewise-constant expm reference on the dense superop
    Sb = lb.superop_basis()
    S = np.asarray(Sb.re) + 1j * np.asarray(Sb.im)     # (2, d^2, d^2)
    n = 4000
    dt = T / n
    v = rho0.flatten(order="F")
    for i in range(n):
        tm = (i + 0.5) * dt
        A = S[0] + float(u_fn(tm)) * S[1]
        v = np.asarray(
            dense_expm(jnp.asarray(A * dt, jnp.complex128))) @ v
    rho_ref = v.reshape(d, d, order="F")
    np.testing.assert_allclose(rho, rho_ref, atol=5e-7)


def test_lindblad_control_gradient():
    """Dissipative optimal control: gradients through the Lindblad solve
    via the reversible adjoint (mild damping, short horizon — the
    documented reconstruction regime) match finite differences."""
    from vec_ode_tpu.diff import adjoint_solve
    from vec_ode_tpu.models.quantum import Lindblad

    d = 2
    lb = Lindblad.make(d=d, seed=3, gamma=0.15)
    basis = lb.superop_basis()

    def cfn(t, th):
        t = jnp.asarray(t)
        u = th[0] * jnp.sin(jnp.pi * t) + th[1] * jnp.sin(2 * jnp.pi * t)
        return jnp.stack([jnp.ones_like(u), u], axis=-1)

    rho0 = np.zeros((d, d), complex)
    rho0[1, 1] = 1.0
    v0 = Lindblad.vec_rho(rho0[None])
    theta = jnp.asarray([0.5, -0.3], jnp.float64)

    def loss(th):
        vf = adjoint_solve(basis, cfn, th, v0, 0.0, 1.0, 64,
                           use_pallas=False)
        # population of the ground state at T (vec index 0 = rho[0,0])
        return vf.re[0, 0]

    v, g = jax.value_and_grad(loss)(theta)
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (loss(theta + e) - loss(theta - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd),
                                   rtol=1e-6, atol=1e-10)


def test_lindblad_dissipative_control_optimization():
    """End-to-end dissipative optimal control: drive a decaying qubit
    (gamma = 0.4) into the excited state with Adam through the adjoint —
    excited population must rise from ~0.01 to >0.8 despite damping."""
    import optax

    from vec_ode_tpu.diff import adjoint_solve
    from vec_ode_tpu.models import Lindblad

    sz = np.diag([1.0, -1.0]).astype(complex)
    sx = np.array([[0, 1], [1, 0]], complex)
    L = np.array([[0, 1], [0, 0]], complex)         # |g><e| decay
    lb = Lindblad(H0=0.5 * sz, Hc=sx, jumps=((0.4, L),))
    basis = lb.superop_basis()

    def cfn(t, th):
        t = jnp.asarray(t)
        j = jnp.arange(1, 5, dtype=jnp.float64)
        u = jnp.sum(th * jnp.sin(j * jnp.pi * t[..., None] / 2.0), axis=-1)
        return jnp.stack([jnp.ones_like(u), u], axis=-1)

    rho0 = np.zeros((2, 2), complex)
    rho0[0, 0] = 1.0                                 # start in |g>
    v0 = Lindblad.vec_rho(rho0[None])
    theta = 0.1 * jnp.ones(4, jnp.float64)

    def loss(th):
        vf = adjoint_solve(basis, cfn, th, v0, 0.0, 2.0, 128,
                           use_pallas=False)
        return 1.0 - vf.re[0, 3]                     # 1 - rho_ee

    vg = jax.jit(jax.value_and_grad(loss))
    opt = optax.adam(0.3)
    st = opt.init(theta)
    hist = []
    for _ in range(120):
        v, g = vg(theta)
        hist.append(float(v))
        up, st = opt.update(g, st)
        theta = optax.apply_updates(theta, up)
    assert hist[0] > 0.9
    assert min(hist) < 0.2, f"dissipative control stalled: {min(hist)}"


def test_fused_loop_many_interior_saves_matches_xla_driver():
    """r3: the PERSISTENT loop kernel now holds up to 32 interior save
    times in-kernel (the old cap was 8); the recorded ys must match the
    XLA driver's grid-hitting saves."""
    from vec_ode_tpu.parallel import ensemble_solve

    _, mod, _ = _driven_setup(d=64, dtype=jnp.float32)
    B = 16
    rng = np.random.default_rng(8)
    psi = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi, jnp.float32)
    save_at = np.linspace(0.02, 0.28, 20, dtype=np.float32)
    ctl = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.2, max_steps=500)

    def solve(stepper):
        return ensemble_solve(
            None, y0, 0.0, 0.3, stepper=stepper, adaptive=True, ctl=ctl,
            h0=1e-2, save_at=save_at, time_dtype=jnp.float32,
        )

    sol_k = solve(vexp.MagnusModulated4(mod, interpret=True))
    assert sol_k.path == "pallas-loop-persistent", sol_k.path
    sol_x = solve(vexp.MagnusModulated4(mod, use_pallas=False))
    assert (np.asarray(sol_k.status) == vo.DONE).all()
    np.testing.assert_array_equal(np.asarray(sol_k.n_accept),
                                  np.asarray(sol_x.n_accept))
    np.testing.assert_allclose(np.asarray(sol_k.ys.re),
                               np.asarray(sol_x.ys.re), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sol_k.ys.im),
                               np.asarray(sol_x.ys.im), atol=2e-5)


def test_magnus6_below_f32_error_floor_surfaces_max_steps():
    """r4 (measured on device): the Magnus-6 6(4) embedded estimate has an
    f32 noise floor ~1e-7, so an rtol far below it rejects every step. The
    solve must terminate with ERR_MAX_STEPS and a FINITE state — never a
    silent livelock at min_dt (the reference's failure mode, ode.rs:324) —
    on both the fused kernel and the XLA driver."""
    from vec_ode_tpu.parallel import ensemble_solve

    _, mod, _ = _driven_setup(d=64, dtype=jnp.float32)
    B = 8
    rng = np.random.default_rng(11)
    psi = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi, jnp.float32)
    ctl = vo.StepControl(rtol=1e-12, min_dt=1e-6, max_dt=0.25, max_steps=64)

    for stepper in (vexp.MagnusModulated6(mod, interpret=True),
                    vexp.MagnusModulated6(mod, use_pallas=False)):
        sol = ensemble_solve(None, y0, 0.0, 1.0, stepper=stepper,
                             adaptive=True, ctl=ctl, h0=1e-2,
                             time_dtype=jnp.float32)
        assert (np.asarray(sol.status) == vo.ERR_MAX_STEPS).all(), (
            stepper, np.asarray(sol.status))
        assert np.isfinite(np.asarray(sol.y_final.re)).all()
        assert np.isfinite(np.asarray(sol.y_final.im)).all()
        assert (np.asarray(sol.n_accept) == 0).all()
