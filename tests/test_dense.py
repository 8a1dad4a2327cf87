"""Dense output: interpolated saves without step-sequence perturbation."""

import jax.numpy as jnp
import numpy as np

import vec_ode_tpu as vo
from vec_ode_tpu.dense import hermite_cubic, solve_ivp_dense


def test_hermite_exact_for_cubics():
    # p(t) = 1 + 2t - t^2 + 0.5 t^3 on [0, dt]
    def p(t):
        return 1 + 2 * t - t**2 + 0.5 * t**3

    def dp(t):
        return 2 - 2 * t + 1.5 * t**2

    dt = 0.7
    for theta in [0.0, 0.3, 0.5, 0.9, 1.0]:
        got = hermite_cubic(
            jnp.asarray(p(0.0)), jnp.asarray(p(dt)),
            jnp.asarray(dp(0.0)), jnp.asarray(dp(dt)),
            jnp.asarray(dt), jnp.asarray(theta),
        )
        np.testing.assert_allclose(float(got), p(theta * dt), rtol=1e-14)


def test_dense_matches_exact_solution():
    save = jnp.linspace(0.1, 1.9, 7, dtype=jnp.float64)
    sol = solve_ivp_dense(
        lambda t, y: -y, 0.0, 2.0, jnp.asarray(1.0, jnp.float64),
        ctl=vo.StepControl(rtol=1e-8), h0=1e-2, save_at=save,
    )
    assert bool(sol.success)
    np.testing.assert_allclose(
        np.asarray(sol.ys), np.exp(-np.asarray(sol.ts)), rtol=1e-5
    )
    assert float(sol.ys[0]) == 1.0  # t0 slot is the exact initial state


def test_dense_does_not_perturb_step_sequence():
    # the controller's step sequence must be IDENTICAL with and without
    # interior save points (unlike "hit" semantics, which truncates)
    kw = dict(ctl=vo.StepControl(rtol=1e-8), h0=1e-2)
    y0 = jnp.asarray(1.0, jnp.float64)
    a = solve_ivp_dense(lambda t, y: -y, 0.0, 2.0, y0, **kw)
    b = solve_ivp_dense(
        lambda t, y: -y, 0.0, 2.0, y0,
        save_at=jnp.linspace(0.05, 1.95, 17, dtype=jnp.float64), **kw,
    )
    assert int(a.n_accept) == int(b.n_accept)
    assert int(a.n_reject) == int(b.n_reject)
    np.testing.assert_allclose(float(a.y_final), float(b.y_final),
                               rtol=1e-15)
    # "hit" semantics DOES take different steps with a dense save grid
    c = vo.solve_ivp(
        lambda t, y: -y, 0.0, 2.0, y0,
        save_at=jnp.linspace(0.05, 1.95, 17, dtype=jnp.float64), **kw,
    )
    assert int(c.n_accept) != int(a.n_accept)


def test_dense_pytree_and_vector_state():
    import scipy.linalg

    A = np.asarray([[0.0, 1.0], [-1.0, 0.0]])
    save = jnp.asarray([0.5, 1.0, 1.5], jnp.float64)
    sol = solve_ivp_dense(
        lambda t, y: jnp.asarray(A) @ y, 0.0, 2.0,
        jnp.asarray([1.0, 0.0], jnp.float64),
        ctl=vo.StepControl(rtol=1e-9, min_dt=1e-8), save_at=save,
    )
    for i, t in enumerate(np.asarray(sol.ts)):
        want = scipy.linalg.expm(A * t) @ np.asarray([1.0, 0.0])
        np.testing.assert_allclose(np.asarray(sol.ys[i]), want, atol=1e-6)


def test_dense_interp_accuracy_order():
    # interpolation error at midpoints scales ~h^4 (cubic Hermite)
    def run(max_dt):
        save = jnp.asarray([0.777], jnp.float64)  # generic interior point
        sol = solve_ivp_dense(
            lambda t, y: -y, 0.0, 2.0, jnp.asarray(1.0, jnp.float64),
            adaptive=False, h0=max_dt, save_at=save,
        )
        return abs(float(sol.ys[1]) - np.exp(-0.777))

    e1, e2 = run(0.2), run(0.1)
    rate = np.log2(e1 / e2)
    assert 3.3 < rate < 5.0, (e1, e2, rate)


def test_solve_linear_dense_magnus():
    """Dense output for exponential steppers: slopes from apply_l."""
    import scipy.linalg

    from vec_ode_tpu import exp as vexp
    from vec_ode_tpu.dense import solve_linear_dense

    A0 = np.asarray([[0.0, 1.0], [-1.0, 0.0]]) * 0.8
    B = np.asarray([[0.3, 0.1], [0.1, -0.3]])

    def op(t):
        return jnp.asarray(A0) + jnp.sin(t) * jnp.asarray(B)

    y0 = jnp.asarray([1.0, 0.0], jnp.float64)
    save = jnp.linspace(0.2, 1.8, 9, dtype=jnp.float64)
    sol = solve_linear_dense(
        op, 0.0, 2.0, y0,
        stepper=vexp.Magnus4(vexp.DenseSplit()),
        adaptive=True, ctl=vo.StepControl(rtol=1e-8, max_dt=0.2),
        h0=1e-2, save_at=save,
    )
    assert bool(sol.success)
    # golden: tiny-step Magnus at each save time
    for i, t in enumerate(np.asarray(sol.ts)):
        ref = vo.solve_linear(
            op, 0.0, float(t) if t > 0 else 1e-9, y0,
            stepper=vexp.Magnus4(vexp.DenseSplit()), h0=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(sol.ys[i]), np.asarray(ref.y_final), atol=5e-6,
            err_msg=f"t={t}",
        )


def test_solve_linear_dense_split_pair():
    from vec_ode_tpu import exp as vexp
    from vec_ode_tpu.dense import solve_linear_dense

    A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float64)
    Bd = jnp.asarray([-0.2, -0.6], jnp.float64)
    y0 = jnp.asarray([1.0, 0.5], jnp.float64)
    sol = solve_linear_dense(
        lambda t: (A, Bd), 0.0, 1.0, y0,
        stepper=vexp.SplitMidpoint(vexp.DenseSplit(), vexp.DiagonalSplit()),
        h0=0.02, save_at=jnp.asarray([0.5]),
    )
    import scipy.linalg

    want = scipy.linalg.expm(0.5 * (np.asarray(A) + np.diag(np.asarray(Bd))))
    np.testing.assert_allclose(
        np.asarray(sol.ys[1]), want @ np.asarray(y0), atol=1e-4
    )


def test_dense_adaptive_without_error_estimate_raises():
    from vec_ode_tpu import exp as vexp
    from vec_ode_tpu.dense import solve_linear_dense

    A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]], jnp.float64)
    try:
        solve_linear_dense(
            lambda t: A, 0.0, 1.0, jnp.asarray([1.0, 0.0], jnp.float64),
            stepper=vexp.ExpMidpoint(vexp.DenseSplit()), adaptive=True,
            h0=0.1,
        )
        assert False, "expected ValueError"
    except ValueError as e:
        assert "error estimate" in str(e)


def test_solve_linear_dense_antihermitian_leaf():
    # the complex eigh leaf (CPU path) must support dense-output slopes
    from vec_ode_tpu import exp as vexp
    from vec_ode_tpu.dense import solve_linear_dense

    H = np.asarray([[0.5, 0.2], [0.2, -0.5]])
    op = lambda t: jnp.asarray(-1j * H, jnp.complex128)
    sol = solve_linear_dense(
        op, 0.0, 1.0, jnp.asarray([1.0, 0.0], jnp.complex128),
        stepper=vexp.ExpMidpoint(vexp.AntiHermitianSplit()), h0=0.05,
        save_at=jnp.asarray([0.5]),
    )
    assert bool(sol.success)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(sol.ys[1])), 1.0, atol=1e-5
    )


# ---- per-tableau dense output, batched/scan paths, FSAL slope reuse --------

def test_dopri5_dense_interp_order4():
    """Interpolation-error convergence slope >= 4 at mid-step points for the
    DOPRI5 continuous extension (cubic Hermite is only ~3)."""
    from vec_ode_tpu.tableaus import DOPRI5

    f = lambda t, y: jnp.sin(3.0 * t) * y
    exact = lambda t: np.exp((1.0 - np.cos(3.0 * np.asarray(t))) / 3.0)
    save = jnp.asarray(np.linspace(0.13, 1.87, 11))
    errs = []
    hs = [0.2, 0.1, 0.05]
    for h in hs:
        sol = solve_ivp_dense(
            f, 0.0, 2.0, jnp.asarray(1.0, jnp.float64),
            tableau=DOPRI5, adaptive=False, h0=h, save_at=save,
            ctl=vo.StepControl(max_steps=10000),
        )
        errs.append(
            np.abs(np.asarray(sol.ys[1:-1]) - exact(save)).max()
        )
    slopes = np.diff(np.log(errs)) / np.diff(np.log(hs))
    assert slopes.mean() > 3.9, (errs, slopes)


def test_bosh32_dense_matches_solution_order():
    from vec_ode_tpu.tableaus import BOSH32

    save = jnp.asarray(np.linspace(0.2, 1.8, 5))
    sol = solve_ivp_dense(
        lambda t, y: -y, 0.0, 2.0, jnp.asarray(1.0, jnp.float64),
        tableau=BOSH32, ctl=vo.StepControl(rtol=1e-6), h0=1e-2, save_at=save,
    )
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.ys),
                               np.exp(-np.asarray(sol.ts)), rtol=1e-4)


def test_dense_fsal_zero_extra_evals():
    """With p_dense + FSAL, the dense loop body calls the RHS exactly s-1
    times (DOPRI5: 6) and once for the initial carry — no interpolation or
    endpoint-slope evaluations. Counted at trace time (the loop body traces
    once)."""
    from vec_ode_tpu.tableaus import DOPRI5, RKF45

    def count_for(tableau):
        calls = {"n": 0}

        def f(t, y):
            calls["n"] += 1
            return -y

        solve_ivp_dense(f, 0.0, 1.0, jnp.asarray(1.0, jnp.float64),
                        tableau=tableau, ctl=vo.StepControl(rtol=1e-6),
                        h0=1e-2)
        return calls["n"]

    assert count_for(DOPRI5) == 1 + 6   # init carry + 6 stages/attempt
    assert count_for(RKF45) == 6 + 1    # 6 stages (f0 = K[0]) + f1 slope


def test_dense_batched_carry_matches_vmap():
    """Natively-batched dense driver == per-trajectory dense solves."""
    from vec_ode_tpu.tableaus import DOPRI5

    def fb(t, y):  # batched RHS: t (B,), y (B, 2)
        rate = jnp.asarray([1.0, 2.0])
        return -rate * y * (1.0 + 0.1 * jnp.sin(t))[..., None]

    B = 4
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.uniform(0.5, 1.5, (B, 2)))
    save = jnp.asarray([0.35, 0.9])
    from vec_ode_tpu import lc

    sol_b = solve_ivp_dense(
        fb, 0.0, 1.5, y0, tableau=DOPRI5,
        ctl=vo.StepControl(rtol=1e-8), h0=1e-2, save_at=save,
        batch_shape=(B,), error_norm=lc.norm_l2_batched,
    )
    assert (np.asarray(sol_b.status) == vo.DONE).all()
    for i in range(B):
        sol_i = solve_ivp_dense(
            lambda t, y: fb(t, y[None])[0], 0.0, 1.5, y0[i],
            tableau=DOPRI5, ctl=vo.StepControl(rtol=1e-8), h0=1e-2,
            save_at=save,
        )
        np.testing.assert_allclose(np.asarray(sol_b.ys[i]),
                                   np.asarray(sol_i.ys), rtol=1e-12,
                                   atol=1e-14)


def test_dense_scan_method_grad():
    """jax.grad through a dense solve (scan driver) — the differentiable
    dense path the reference's empty diff module never delivered."""
    import jax

    from vec_ode_tpu.tableaus import DOPRI5

    save = jnp.asarray([0.5])

    def loss(k):
        sol = solve_ivp_dense(
            lambda t, y: -k * y, 0.0, 1.0, jnp.asarray(1.0, jnp.float64),
            tableau=DOPRI5, ctl=vo.StepControl(rtol=1e-8, max_steps=64),
            h0=1e-2, save_at=save, method="scan",
        )
        return sol.ys[1]  # y(0.5), interpolated

    k0 = 1.3
    g = jax.grad(loss)(jnp.asarray(k0, jnp.float64))
    # d/dk e^{-k/2} = -0.5 e^{-k/2}
    np.testing.assert_allclose(float(g), -0.5 * np.exp(-k0 / 2), rtol=1e-5)


def test_dense_pdense_consistent_with_hermite():
    """Both interpolants agree to their shared order on a smooth problem."""
    from vec_ode_tpu.tableaus import DOPRI5

    save = jnp.asarray(np.linspace(0.1, 0.9, 7))
    kw = dict(ctl=vo.StepControl(rtol=1e-10), h0=1e-2, save_at=save)
    sol_p = solve_ivp_dense(lambda t, y: -y + jnp.cos(t), 0.0, 1.0,
                            jnp.asarray(0.5, jnp.float64),
                            tableau=DOPRI5, **kw)
    sol_h = solve_ivp_dense(lambda t, y: -y + jnp.cos(t), 0.0, 1.0,
                            jnp.asarray(0.5, jnp.float64),
                            tableau=DOPRI5, advance_lower=False,
                            **kw)  # same advance; hermite only if p absent
    np.testing.assert_allclose(np.asarray(sol_p.ys), np.asarray(sol_h.ys),
                               rtol=1e-9, atol=1e-11)


def test_solve_linear_dense_modulated_stepper():
    """Dense output with a modulated-operator stepper: slopes via
    op.assemble (the `op` branch in solve_linear_dense)."""
    from vec_ode_tpu import exp as vexp
    from vec_ode_tpu.dense import solve_linear_dense
    from vec_ode_tpu.models import DrivenDense
    from vec_ode_tpu.ops import cplx as cp

    model = DrivenDense.make(d=6, seed=2)
    mod = model.modulated(jnp.float64)
    rng = np.random.default_rng(3)
    z = rng.standard_normal(6) + 1j * rng.standard_normal(6)
    z /= np.linalg.norm(z)
    psi0 = cp.from_complex(z, jnp.float64)
    save = jnp.asarray([0.3, 0.8])

    sol = solve_linear_dense(
        None, 0.0, 1.2, psi0, stepper=vexp.MagnusModulated4(mod),
        adaptive=True, ctl=vo.StepControl(rtol=1e-8, max_dt=0.2),
        save_at=save,
    )
    assert bool(np.asarray(sol.status) == vo.DONE)
    # reference: grid-hitting solve at the same times
    sol_ref = vo.solve_linear(
        None, 0.0, 1.2, psi0, stepper=vexp.MagnusModulated4(mod),
        adaptive=True, ctl=vo.StepControl(rtol=1e-8, max_dt=0.2),
        save_at=save,
    )
    np.testing.assert_allclose(np.asarray(sol.ys.re),
                               np.asarray(sol_ref.ys.re),
                               rtol=1e-5, atol=1e-7)


def test_dense_slot0_survives_first_step_overflow():
    """Regression: a rejected FIRST trial with overflowed stages must not
    poison ys[..., 0] (slot 0 records y0 directly, not via the
    interpolant where 0 * inf = NaN)."""
    def rhs(t, y):
        return -50.0 * y ** 3          # stiff: big h0 overflows the trial

    y0 = jnp.asarray([1.0, 2.0], jnp.float64)
    sol = vo.solve_ivp_dense(
        rhs, 0.0, 1.0, y0, save_at=jnp.asarray([0.5]),
        h0=1.0, ctl=vo.StepControl(rtol=1e-6, min_dt=1e-9, max_dt=1.0,
                                   max_steps=10000),
    )
    assert int(sol.status) == vo.DONE
    np.testing.assert_allclose(np.asarray(sol.ys[0]), np.asarray(y0),
                               rtol=0, atol=0)
    assert np.isfinite(np.asarray(sol.ys)).all()


def test_dense_failed_lane_keeps_unreached_final_slot():
    """Regression: a lane that fails mid-run must not report its
    mid-integration state as y(tf) in the last dense slot."""
    def rhs(t, y):
        return y * y                   # blows up before tf for large y0

    y0 = jnp.asarray([[0.1], [3.0]], jnp.float64)  # lane 1 diverges
    from vec_ode_tpu.dense import integrate_interp
    from vec_ode_tpu.rk import RungeKutta

    stepper = RungeKutta()
    base = stepper.make_step_fn(lambda t, y: rhs(t, y))

    import jax as _jax

    def step_dense(t, x, dt):
        xn, err = base(t, x, dt)
        return xn, err, (rhs(t, x), rhs(t + dt, xn))

    sol = integrate_interp(
        _jax.vmap(step_dense), y0,
        jnp.asarray([0.0, 0.9], jnp.float64), 1e-3,
        adaptive=True,
        ctl=vo.StepControl(rtol=1e-6, min_dt=1e-6, max_dt=0.5,
                           max_steps=300),
        error_norm=_jax.vmap(vo.lc.norm_l2), batch_shape=(2,),
    )
    st = np.asarray(sol.status)
    assert st[0] == vo.DONE and st[1] != vo.DONE
    # healthy lane's final slot IS its final state
    np.testing.assert_allclose(np.asarray(sol.ys[0, -1]),
                               np.asarray(sol.y_final[0]), rtol=0)
    # failed lane's final slot must NOT be its mid-run state
    assert not np.allclose(np.asarray(sol.ys[1, -1]),
                           np.asarray(sol.y_final[1]))
