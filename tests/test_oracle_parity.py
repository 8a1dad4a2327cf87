"""Cross-language golden parity: the JAX driver vs the native C++ oracle.

The oracle (native/vecode_oracle.cc) independently implements the reference's
adaptive RKF45 semantics (tableau, lower-order advance, rtol-only controller,
t_list grid hitting). Trajectories, step counts, AND the per-iteration
event sequence must match the JAX driver in f64.

Every StepControl here sets ``time_compensated=False``: the reference (and
the oracle) accumulate t PLAINLY in f64 (t += dt, ode.rs:184-188), while the
driver's default compensated (TwoSum) accumulation is occasionally 1 ulp
more accurate — enough to flip a marginal accept and shift the event
sequence. The flag pins bit-exact reference behavior (controller.py).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu.models import stable_dense_matrix
from vec_ode_tpu.utils import oracle


@pytest.fixture(scope="module")
def lib():
    return oracle.load()


def jax_events(A, y0, t0, tf, h0, ctl, adaptive=True, n_max=100000):
    from vec_ode_tpu.rk import rk_step

    def rhs(t, y):
        return jnp.einsum(
            "ij,j->i", A, y, precision=jax.lax.Precision.HIGHEST
        )

    def step_fn(t, x, dt):
        return rk_step(rhs, t, x, dt, vo.RKF45)

    t_grid = vo.make_grid(t0, tf, dtype=jnp.float64)
    state = vo.init_state(jnp.asarray(y0, jnp.float64), t_grid, h0)
    step = jax.jit(
        functools.partial(
            vo.step_once, step_fn=step_fn, adaptive=adaptive, ctl=ctl
        )
    )
    events = []
    for _ in range(n_max):
        state = step(state)
        events.append(int(state.last_event))
        if int(state.status) != vo.RUNNING:
            break
    return state, events


def test_controller_table_parity(lib):
    from vec_ode_tpu.controller import StepControl, controller_update

    rng = np.random.default_rng(0)
    for _ in range(200):
        h = 10.0 ** rng.uniform(-6, 0)
        dx = 10.0 ** rng.uniform(-12, 0)
        got_h, got_acc = controller_update(
            jnp.asarray(h, jnp.float64), jnp.asarray(dx, jnp.float64),
            StepControl(),
        )
        want_h, want_acc = oracle.controller_update(h, dx)
        np.testing.assert_allclose(float(got_h), want_h, rtol=5e-16)
        assert bool(got_acc) == want_acc, (h, dx)


@pytest.mark.parametrize("adaptive", [True, False])
def test_trajectory_and_event_parity_8dim(lib, adaptive):
    # BASELINE config 1: adaptive RKF45, 8-dim f64 linear ODE y'=Ay
    A = np.asarray(stable_dense_matrix(8, seed=3), np.float64)
    y0 = np.linspace(0.3, 1.0, 8)
    ctl = vo.StepControl(time_compensated=False, rtol=1e-6, min_dt=1e-6, max_dt=0.5)
    h0 = 1e-3

    want = oracle.solve_linear_rkf45(
        A, y0, 0.0, 2.0, h0, rtol=1e-6, min_dt=1e-6, max_dt=0.5,
        adaptive=adaptive,
    )
    state, events = jax_events(A, y0, 0.0, 2.0, h0, ctl, adaptive=adaptive)

    assert int(state.status) == vo.DONE
    assert want["status"] == 1
    # identical event sequences (accept/reject/chkpt/end ordering)
    np.testing.assert_array_equal(np.asarray(events, np.int8), want["events"])
    assert int(state.n_accept) == want["n_accept"]
    assert int(state.n_reject) == want["n_reject"]
    np.testing.assert_allclose(float(state.t), want["t_final"], rtol=1e-15)
    np.testing.assert_allclose(
        np.asarray(state.x), want["y_final"], rtol=1e-12, atol=1e-14
    )
    np.testing.assert_allclose(float(state.h), want["h_final"], rtol=1e-12)


def test_reference_typo_inflates_error_estimate(lib):
    # with the reference's a[5][2] literal the error estimate is inflated ->
    # strictly more steps at the same tolerance (documents the quirk)
    A = np.asarray(stable_dense_matrix(4, seed=5), np.float64)
    y0 = np.ones(4)
    base = oracle.solve_linear_rkf45(
        A, y0, 0.0, 1.0, 1e-3, rtol=1e-8, max_dt=0.5,
        reference_typo=False,
    )
    typo = oracle.solve_linear_rkf45(
        A, y0, 0.0, 1.0, 1e-3, rtol=1e-8, max_dt=0.5,
        reference_typo=True,
    )
    assert typo["n_accept"] > base["n_accept"]
    # both still land on the right answer (b_err never weights K6)
    import scipy.linalg

    exact = scipy.linalg.expm(A) @ y0
    np.testing.assert_allclose(base["y_final"], exact, atol=1e-7)
    np.testing.assert_allclose(typo["y_final"], exact, atol=1e-7)


def test_property_sweep_random_configs(lib):
    """20 random (matrix, tolerance, step-range, h0) configs: the JAX driver
    and the C++ oracle must agree on the exact event sequence, counters and
    final state."""
    rng = np.random.default_rng(123)
    for trial in range(20):
        d = int(rng.integers(2, 7))
        A = np.array(stable_dense_matrix(d, seed=100 + trial, dtype=None))
        A *= rng.uniform(0.3, 2.0)
        y0 = rng.standard_normal(d)
        rtol = 10.0 ** rng.uniform(-9, -4)
        min_dt = 1e-7
        max_dt = float(rng.uniform(0.2, 1.0))
        h0 = float(rng.uniform(2e-4, 5e-2))
        tf = float(rng.uniform(0.5, 2.5))
        adaptive = bool(rng.integers(0, 2))

        want = oracle.solve_linear_rkf45(
            A, y0, 0.0, tf, h0, rtol=rtol, min_dt=min_dt, max_dt=max_dt,
            adaptive=adaptive,
        )
        ctl = vo.StepControl(time_compensated=False, rtol=rtol, min_dt=min_dt, max_dt=max_dt)
        state, events = jax_events(A, y0, 0.0, tf, h0, ctl,
                                   adaptive=adaptive)
        msg = f"trial {trial}: d={d} rtol={rtol:.2e} h0={h0} tf={tf}"
        assert int(state.status) == vo.DONE, msg
        np.testing.assert_array_equal(
            np.asarray(events, np.int8), want["events"], err_msg=msg
        )
        assert int(state.n_accept) == want["n_accept"], msg
        assert int(state.n_reject) == want["n_reject"], msg
        np.testing.assert_allclose(
            np.asarray(state.x), want["y_final"], rtol=1e-10, atol=1e-12,
            err_msg=msg,
        )


def test_strict_end_test_event_parity():
    """strict_end_test=True (reference-exact approx::relative_eq end test,
    ode.rs:389-393) reproduces the oracle's strict-mode event sequence —
    the oracle implements relative_eq independently (vecode_oracle.cc)."""
    from vec_ode_tpu.utils import oracle

    rng = np.random.default_rng(11)
    d = 4
    A = -np.eye(d) + 0.2 * rng.standard_normal((d, d))
    y0 = rng.standard_normal(d)
    kw = dict(rtol=1e-6, min_dt=1e-8, max_dt=0.5, h0=1e-2)

    ref = oracle.solve_linear_rkf45(
        A, y0, 0.0, 1.0, kw["h0"], rtol=kw["rtol"], min_dt=kw["min_dt"],
        max_dt=kw["max_dt"], strict_end=True,
    )
    assert ref["status"] == 1

    ctl = vo.StepControl(time_compensated=False, rtol=kw["rtol"], min_dt=kw["min_dt"],
                         max_dt=kw["max_dt"], strict_end_test=True)
    state, events = jax_events(A, y0, 0.0, 1.0, kw["h0"], ctl)
    assert int(state.status) == vo.DONE
    np.testing.assert_array_equal(np.asarray(events, np.int8),
                                  ref["events"])
    np.testing.assert_allclose(np.asarray(state.x), ref["y_final"],
                               rtol=1e-12, atol=1e-14)


def test_strict_end_test_large_t_equivalence():
    """|t| >> 1 grid hitting: round 1 assumed the reference's unscaled eps
    end test deadlocks at large |t|; it does NOT — the truncated step's
    rem = tf - t is EXACT near the grid time (Sterbenz), so t + rem lands
    exactly and both tolerances see rem == 0. This test documents the
    equivalence (identical event sequences vs the independent C++ oracle in
    BOTH modes at t ~ 1e12)."""
    from vec_ode_tpu.utils import oracle

    A = -np.eye(1)
    y0 = np.ones(1)
    t0 = 1.0e12 + 0.3
    tf = t0 + 1.0
    base = dict(rtol=1e-6, min_dt=1e-9, max_dt=0.5, max_steps=4000)

    evs = {}
    for strict in (False, True):
        ref = oracle.solve_linear_rkf45(
            A, y0, t0, tf, 1e-2, rtol=base["rtol"], min_dt=base["min_dt"],
            max_dt=base["max_dt"], strict_end=strict,
            max_steps=base["max_steps"],
        )
        assert ref["status"] == 1
        ctl = vo.StepControl(time_compensated=False, strict_end_test=strict, **base)
        state, events = jax_events(A, y0, t0, tf, 1e-2, ctl)
        assert int(state.status) == vo.DONE
        np.testing.assert_array_equal(np.asarray(events, np.int8),
                                      ref["events"])
        evs[strict] = np.asarray(events, np.int8)
    np.testing.assert_array_equal(evs[False], evs[True])


def test_magnus4_trajectory_and_event_parity(lib):
    """Cross-language parity for the EXPONENTIAL solver family: adaptive
    Magnus-4 on y' = (A0 + cos(w t) A1) y — the C++ oracle implements the
    magnus_42 kernel (GL2 nodes, commutator, embedded order-2 pair) with
    its own scaling+Taylor exponential ACTION; the JAX side must match the
    per-iteration event sequence, counters, and trajectory in f64."""
    from vec_ode_tpu import exp as vexp

    rng = np.random.default_rng(7)
    d, w = 5, 2.1
    M0 = rng.standard_normal((d, d)) * 0.6
    A0 = M0 - M0.T                         # skew: bounded dynamics
    M1 = rng.standard_normal((d, d)) * 0.4
    A1 = M1 - M1.T
    y0 = rng.standard_normal(d)
    rtol, h0, tf = 1e-7, 1e-2, 1.5

    want = oracle.solve_linear_magnus4(
        A0, A1, w, y0, 0.0, tf, h0, rtol=rtol, min_dt=1e-6, max_dt=0.5,
    )
    assert want["status"] == 1

    def op_fn(t):
        return jnp.asarray(A0) + jnp.cos(w * t) * jnp.asarray(A1)

    split = vexp.DenseSplit()
    step_raw = vexp.Magnus4(split).make_step_fn(op_fn)
    ctl = vo.StepControl(time_compensated=False, rtol=rtol, min_dt=1e-6, max_dt=0.5)
    t_grid = vo.make_grid(0.0, tf, dtype=jnp.float64)
    state = vo.init_state(jnp.asarray(y0, jnp.float64), t_grid, h0)
    step = jax.jit(functools.partial(
        vo.step_once, step_fn=step_raw, adaptive=True, ctl=ctl))
    events = []
    for _ in range(100000):
        state = step(state)
        events.append(int(state.last_event))
        if int(state.status) != vo.RUNNING:
            break

    assert int(state.status) == vo.DONE
    np.testing.assert_array_equal(np.asarray(events, np.int8),
                                  want["events"])
    assert int(state.n_accept) == want["n_accept"]
    assert int(state.n_reject) == want["n_reject"]
    np.testing.assert_allclose(np.asarray(state.x), want["y_final"],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(state.t), want["t_final"], rtol=1e-15)


def test_cfm4_trajectory_and_event_parity(lib):
    """Cross-language parity for the COMMUTATOR-FREE solver family (r3):
    adaptive CFM-4 (reference ExpCFMSolver configuration, cfm.rs:131-155)
    on y' = (A0 + cos(w t) A1) y — the C++ oracle implements cfm_general's
    two-exponential chain + the CFM_R2_J1_GL error pass with its own
    scaling+Taylor exponential action; the JAX side must match the
    per-iteration event sequence, counters, and trajectory in f64."""
    from vec_ode_tpu import exp as vexp

    rng = np.random.default_rng(11)
    d, w = 5, 1.7
    M0 = rng.standard_normal((d, d)) * 0.6
    A0 = M0 - M0.T
    M1 = rng.standard_normal((d, d)) * 0.4
    A1 = M1 - M1.T
    y0 = rng.standard_normal(d)
    rtol, h0, tf = 1e-7, 1e-2, 1.5

    want = oracle.solve_linear_cfm4(
        A0, A1, w, y0, 0.0, tf, h0, rtol=rtol, min_dt=1e-6, max_dt=0.5,
    )
    assert want["status"] == 1

    def op_fn(t):
        return jnp.asarray(A0) + jnp.cos(w * t) * jnp.asarray(A1)

    split = vexp.DenseSplit()
    step_raw = vexp.CFM4(split).make_step_fn(op_fn)
    ctl = vo.StepControl(time_compensated=False, rtol=rtol, min_dt=1e-6, max_dt=0.5)
    t_grid = vo.make_grid(0.0, tf, dtype=jnp.float64)
    state = vo.init_state(jnp.asarray(y0, jnp.float64), t_grid, h0)
    step = jax.jit(functools.partial(
        vo.step_once, step_fn=step_raw, adaptive=True, ctl=ctl))
    events = []
    for _ in range(100000):
        state = step(state)
        events.append(int(state.last_event))
        if int(state.status) != vo.RUNNING:
            break

    assert int(state.status) == vo.DONE
    np.testing.assert_array_equal(np.asarray(events, np.int8),
                                  want["events"])
    assert int(state.n_accept) == want["n_accept"]
    assert int(state.n_reject) == want["n_reject"]
    np.testing.assert_allclose(np.asarray(state.x), want["y_final"],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(state.t), want["t_final"], rtol=1e-15)


@pytest.mark.parametrize("kind,kind_name", [(0, "l2"), (1, "rms"),
                                            (2, "max")])
def test_cfm4_user_normfn_parity(lib, kind, kind_name):
    """The reference's user NormFn contract (ExpCFMSolver takes an
    arbitrary error measure, cfm.rs:131-155), pinned cross-language (r4):
    the C++ oracle applies a weighted l2/rms/max to its embedded error
    vector; the JAX CFM-4 with the SAME lc.WeightedNorm as error_norm=
    must reproduce the per-iteration event sequence, counters and
    trajectory in f64."""
    from vec_ode_tpu import exp as vexp
    from vec_ode_tpu import lc

    rng = np.random.default_rng(13)
    d, w = 5, 1.7
    M0 = rng.standard_normal((d, d)) * 0.6
    A0 = M0 - M0.T
    M1 = rng.standard_normal((d, d)) * 0.4
    A1 = M1 - M1.T
    y0 = rng.standard_normal(d)
    weights = rng.uniform(0.3, 2.5, d)
    rtol, h0, tf = 1e-7, 1e-2, 1.5

    want = oracle.solve_linear_cfm4(
        A0, A1, w, y0, 0.0, tf, h0, rtol=rtol, min_dt=1e-6, max_dt=0.5,
        norm_weights=weights, norm_kind=kind,
    )
    assert want["status"] == 1

    def op_fn(t):
        return jnp.asarray(A0) + jnp.cos(w * t) * jnp.asarray(A1)

    wn = lc.WeightedNorm(kind_name, weights=weights)
    step_raw = vexp.CFM4(vexp.DenseSplit()).make_step_fn(op_fn)
    ctl = vo.StepControl(time_compensated=False, rtol=rtol, min_dt=1e-6,
                         max_dt=0.5)
    t_grid = vo.make_grid(0.0, tf, dtype=jnp.float64)
    state = vo.init_state(jnp.asarray(y0, jnp.float64), t_grid, h0)
    step = jax.jit(functools.partial(
        vo.step_once, step_fn=step_raw, adaptive=True, ctl=ctl,
        error_norm=wn))
    events = []
    for _ in range(100000):
        state = step(state)
        events.append(int(state.last_event))
        if int(state.status) != vo.RUNNING:
            break

    assert int(state.status) == vo.DONE
    np.testing.assert_array_equal(np.asarray(events, np.int8),
                                  want["events"])
    assert int(state.n_accept) == want["n_accept"]
    assert int(state.n_reject) == want["n_reject"]
    np.testing.assert_allclose(np.asarray(state.x), want["y_final"],
                               rtol=1e-10, atol=1e-12)
