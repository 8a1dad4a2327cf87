"""Model library + BASELINE config 2: fixed-step RK4 on nonlinear
Van der Pol / Lotka-Volterra trajectory batches."""

import jax
import jax.numpy as jnp
import numpy as np

import vec_ode_tpu as vo
from vec_ode_tpu.models import (
    Brusselator,
    DecayDiag,
    LinearConstant,
    LotkaVolterra,
    VanDerPol,
    stable_dense_matrix,
)
from vec_ode_tpu.parallel import ensemble_solve


def test_linear_constant_exact():
    m = LinearConstant(A=stable_dense_matrix(6, seed=1))
    y0 = jnp.ones(6, jnp.float64)
    sol = vo.solve_ivp(m.rhs, 0.0, 1.5, y0, ctl=vo.StepControl(rtol=1e-10,
                                                               min_dt=1e-9))
    np.testing.assert_allclose(
        np.asarray(sol.y_final), np.asarray(m.exact(1.5, y0)), atol=1e-8
    )


def test_decay_diag_matches_reference_problem():
    m = DecayDiag(rates=jnp.asarray([-1.0, -2.0], jnp.float64))
    y0 = jnp.ones(2, jnp.float64)
    sol = vo.solve_ivp(m.rhs, 0.0, 2.0, y0, adaptive=False, h0=1e-3)
    np.testing.assert_allclose(
        np.asarray(sol.y_final), np.asarray(m.exact(2.0, y0)), rtol=1e-10
    )


def test_vdp_rk4_batch():
    # BASELINE config 2: fixed-step RK4, small batch of VdP trajectories
    m = VanDerPol(mu=1.0)
    y0 = jnp.stack(
        [jnp.asarray([2.0, 0.0]) + 0.05 * k for k in range(8)]
    ).astype(jnp.float64)
    sols = ensemble_solve(
        m.rhs, y0, 0.0, 10.0,
        stepper=vo.RungeKutta(vo.RK4), adaptive=False, h0=0.01,
    )
    assert all(int(s) == vo.DONE for s in sols.status)
    # VdP mu=1 limit cycle has amplitude ~2.0 in x
    x_final = np.asarray(sols.y_final)[:, 0]
    assert np.all(np.abs(x_final) < 2.3)
    # convergence: halving h changes the answer at ~h^4
    sols2 = ensemble_solve(
        m.rhs, y0, 0.0, 10.0,
        stepper=vo.RungeKutta(vo.RK4), adaptive=False, h0=0.005,
    )
    d = np.abs(np.asarray(sols.y_final) - np.asarray(sols2.y_final)).max()
    assert d < 1e-6


def test_lotka_volterra_invariant_drift():
    m = LotkaVolterra()
    y0 = jnp.asarray([1.0, 1.0], jnp.float64)
    sol = vo.solve_ivp(
        m.rhs, 0.0, 10.0, y0,
        stepper=vo.RungeKutta(vo.RK4), adaptive=False, h0=0.005,
    )
    V0 = float(m.invariant(y0))
    Vf = float(m.invariant(sol.y_final))
    assert abs(Vf - V0) < 1e-7  # conserved quantity preserved at O(h^4)


def test_lotka_volterra_adaptive_matches_fixed():
    m = LotkaVolterra()
    y0 = jnp.asarray([1.2, 0.8], jnp.float64)
    fixed = vo.solve_ivp(m.rhs, 0.0, 5.0, y0, adaptive=False, h0=1e-3)
    adap = vo.solve_ivp(
        m.rhs, 0.0, 5.0, y0,
        ctl=vo.StepControl(rtol=1e-10, min_dt=1e-8, max_dt=0.1),
    )
    np.testing.assert_allclose(
        np.asarray(adap.y_final), np.asarray(fixed.y_final), rtol=1e-6
    )
    assert int(adap.n_accept) < int(fixed.n_accept)  # fewer, larger steps


def test_brusselator_limit_cycle():
    m = Brusselator(A=1.0, B=3.0)
    y0 = jnp.asarray([1.0, 1.0], jnp.float64)
    sol = vo.solve_ivp(
        m.rhs, 0.0, 20.0, y0, ctl=vo.StepControl(rtol=1e-8, max_dt=0.5),
    )
    assert bool(sol.success)
    u, v = np.asarray(sol.y_final)
    assert 0.1 < u < 4.5 and 0.1 < v < 5.5  # on the attractor


def test_vdp_jit_vmap_grid_of_mu():
    # vmap over model parameters (closure via vmapped rhs argument)
    mus = jnp.linspace(0.1, 2.0, 4, dtype=jnp.float64)

    @jax.jit
    @jax.vmap
    def run(mu):
        def rhs(t, y):
            x, v = y[0], y[1]
            return jnp.stack([v, mu * (1 - x * x) * v - x])

        sol = vo.solve_ivp(
            rhs, 0.0, 5.0, jnp.asarray([1.0, 0.0], jnp.float64),
            adaptive=False, h0=0.01, stepper=vo.RungeKutta(vo.RK4),
        )
        return sol.y_final, sol.status

    yf, status = run(mus)
    assert all(int(s) == vo.DONE for s in status)
    assert yf.shape == (4, 2)


def test_tight_binding_chain_split_solvers():
    """Driven chain: split solvers (dense hop leaf + diagonal onsite leaf)
    vs a dense Magnus-4 golden reference; unitarity throughout."""
    from vec_ode_tpu import exp as vexp
    from vec_ode_tpu.models import TightBindingChain
    from vec_ode_tpu.ops import cplx as cp

    chain = TightBindingChain(n=8, J=1.0, seed=3, w=2.0)
    psi0_np = np.zeros(8, np.complex128)
    psi0_np[4] = 1.0

    golden = vo.solve_linear(
        chain.op, 0.0, 2.0, jnp.asarray(psi0_np),
        stepper=vo.exp.Magnus4(vo.exp.DenseSplit()), h0=1e-3,
    )

    y0 = cp.from_complex(psi0_np, jnp.float64)
    errs = []
    for h in [0.05, 0.025]:
        sol = vo.solve_linear(
            lambda t: chain.ops_pair(t, jnp.float64), 0.0, 2.0, y0,
            stepper=vexp.SplitMidpoint(
                vexp.DenseCplxSplit(), vexp.DiagonalCplxSplit()
            ),
            h0=h,
        )
        got = np.asarray(cp.to_complex(sol.y_final))
        # unitarity of the split propagation
        np.testing.assert_allclose(np.linalg.norm(got), 1.0, atol=1e-12)
        errs.append(np.linalg.norm(got - np.asarray(golden.y_final)))
    # corrected Strang midpoint: order 2
    assert 1.6 < np.log2(errs[0] / errs[1]) < 2.4, errs

    # RKN order-4 split composition on the same problem
    comp = vo.exp.RKNR4Split(vexp.DenseCplxSplit(), vexp.DiagonalCplxSplit())
    errs4 = []
    for h in [0.1, 0.05]:
        sol = vo.solve_linear(
            lambda t: chain.ops_pair(t, jnp.float64), 0.0, 2.0, y0,
            stepper=vexp.ExpMidpoint(comp), h0=h,
        )
        got = np.asarray(cp.to_complex(sol.y_final))
        errs4.append(np.linalg.norm(got - np.asarray(golden.y_final)))
    # split composition of a time-dependent generator sampled at midpoint:
    # splitting error is O(h^4) but the midpoint sampling limits to O(h^2);
    # for this weakly-driven chain the observed rate sits in between
    assert errs4[1] < errs4[0] / 3.0, errs4
