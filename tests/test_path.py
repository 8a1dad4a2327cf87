"""Execution-path diagnostics: Solution.path + config.warn_on_fallback
(VERDICT r2 item 4: a batched TPU solve that silently falls back to the XLA
driver should be observable)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.models import DrivenDense
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_solve


def _y0(B=8, d=4, seed=0):
    rng = np.random.default_rng(seed)
    psi = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    return cp.from_complex(psi, jnp.float64)


def test_default_path_is_xla_driver():
    sol = vo.solve_ivp(lambda t, y: -y, 0.0, 1.0, jnp.ones(3))
    assert sol.path == "xla-driver"


def test_path_survives_pytree_roundtrip_and_vmap():
    sol = vo.solve_ivp(lambda t, y: -y, 0.0, 1.0, jnp.ones(3))
    leaves, treedef = jax.tree_util.tree_flatten(sol)
    sol2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert sol2.path == sol.path


def test_modulated_cpu_fallback_path_tag():
    # on CPU the fused loop/step kernels never engage: path stays xla-driver
    model = DrivenDense.make(d=4, seed=0)
    mod = model.modulated(jnp.float64)
    stepper = vexp.MagnusModulated4(mod)
    sol = ensemble_solve(
        None, _y0(), 0.0, 0.2, stepper=stepper, adaptive=True,
        ctl=vo.StepControl(rtol=1e-6, max_dt=0.1), h0=1e-2,
        time_dtype=jnp.float64,
    )
    assert sol.path == "xla-driver"
    assert bool(jnp.all(sol.success))


def test_fused_loop_interpret_path_tag():
    # interpret=True engages the whole-loop kernel on CPU -> persistent tag
    model = DrivenDense.make(d=64, seed=0)
    mod = model.modulated(jnp.float32)
    stepper = vexp.MagnusModulated4(mod, interpret=True)
    y0 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), _y0(B=16, d=64))
    sol = ensemble_solve(
        None, y0, 0.0, 0.1, stepper=stepper, adaptive=True,
        ctl=vo.StepControl(rtol=1e-4, max_dt=0.05), h0=1e-2,
        time_dtype=jnp.float32,
    )
    assert sol.path == "pallas-loop-persistent"


def test_warn_on_fallback_names_the_rule():
    # interpret=True makes the loop kernel reachable on CPU; a save grid
    # beyond even the WINDOWED persistent cap (1026 points — r5 lifted the
    # old 34-point register cap via windowed launches) fails eligibility
    # and should warn when opted in. fused_loop_solve is probed directly:
    # it returns None on ineligibility without running the XLA fallback.
    from vec_ode_tpu.driver import make_grid

    model = DrivenDense.make(d=64, seed=0)
    mod = model.modulated(jnp.float32)
    stepper = vexp.MagnusModulated4(mod, interpret=True)
    y0 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), _y0(B=16, d=64))
    save_at = np.linspace(0.01, 0.09, 1060).astype(np.float32)
    t_grid = make_grid(jnp.float32(0.0), jnp.float32(0.1),
                       save_at=save_at, dtype=jnp.float32)

    vo.config.warn_on_fallback = True
    try:
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            sol = stepper.fused_loop_solve(
                y0, t_grid, 1e-2, adaptive=True,
                ctl=vo.StepControl(rtol=1e-4, max_dt=0.05),
            )
        msgs = [str(w.message) for w in rec]
        assert sol is None
        assert any("save grid has 1062 points" in m for m in msgs), msgs

        # the old 34-point register cap is gone: the same 42-point grid
        # that used to warn now keeps the persistent kernel (windowed
        # launches) with no fallback warning
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            sol = ensemble_solve(
                None, y0, 0.0, 0.1, stepper=stepper, adaptive=True,
                ctl=vo.StepControl(rtol=1e-4, max_dt=0.05), h0=1e-2,
                save_at=np.linspace(0.01, 0.09, 40), time_dtype=jnp.float32,
            )
        assert not [w for w in rec if "vec_ode" in str(w.message)], (
            [str(w.message) for w in rec])
    finally:
        vo.config.warn_on_fallback = False
    assert sol.path == "pallas-loop-persistent"


def test_no_warning_when_not_opted_in():
    model = DrivenDense.make(d=64, seed=0)
    mod = model.modulated(jnp.float32)
    stepper = vexp.MagnusModulated4(mod, interpret=True)
    y0 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), _y0(B=16, d=64))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ensemble_solve(
            None, y0, 0.0, 0.1, stepper=stepper, adaptive=True,
            ctl=vo.StepControl(rtol=1e-4, max_dt=0.05), h0=1e-2,
            save_at=np.linspace(0.01, 0.09, 40), time_dtype=jnp.float32,
        )
    assert not [w for w in rec if "vec_ode_tpu" in str(w.message)]


def test_warn_on_fallback_events():
    # r5 contract (VERDICT r4 #3): a TRACEABLE opaque event callable runs
    # in-kernel — no fallback, no warning; only a genuinely UNtraceable one
    # pushes the solve off the kernel tier, with the rule named
    model = DrivenDense.make(d=64, seed=0)
    mod = model.modulated(jnp.float32)
    stepper = vexp.MagnusModulated4(mod, interpret=True)
    y0 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), _y0(B=16, d=64))
    kw = dict(stepper=stepper, adaptive=True,
              ctl=vo.StepControl(rtol=1e-4, max_dt=0.05), h0=1e-2,
              time_dtype=jnp.float32)

    vo.config.warn_on_fallback = True
    try:
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            sol = ensemble_solve(
                None, y0, 0.0, 0.1,
                events=vo.Event(lambda t, y: jnp.sum(y.re ** 2) - 2.0),
                **kw)
        msgs = [str(w.message) for w in rec]
        assert not any("events=" in m for m in msgs), msgs
        assert sol.path == "pallas-loop-persistent"

        # untraceable (concretizes a tracer): the kernel tier warns with
        # the named rule; the XLA driver cannot trace it either, so the
        # fallback solve raises at trace time
        import pytest

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            with pytest.raises(Exception):
                ensemble_solve(
                    None, y0, 0.0, 0.1,
                    events=vo.Event(
                        lambda t, y: float(np.asarray(y.re).max())),
                    **kw)
        msgs = [str(w.message) for w in rec]
        assert any("events=" in m for m in msgs), msgs
    finally:
        vo.config.warn_on_fallback = False
