"""Secondary benchmarks: the full BASELINE.md config matrix.

``bench.py`` is the driver-facing headline (one JSON line, config 5). This
script measures the remaining configs and prints one JSON line per config —
run manually on the target hardware:

    python benchmarks.py            # all configs
    python benchmarks.py rk4 cfm    # substring filter
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import vec_ode_tpu as vo
from vec_ode_tpu import exp as vexp
from vec_ode_tpu.models import DrivenDense, LandauZener, VanDerPol
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_solve


def timed(run_sync, reps=3):
    run_sync()  # warmup/compile
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = run_sync()
    return (time.perf_counter() - t0) / reps, out


def steady_rate(run1, reps=8):
    """ONE solve per dispatch with a device->host sync between calls — the
    optimizer-loop pattern an actual user sees (VERDICT r3 #9; the chained
    rows amortize the ~100 ms tunnel dispatch latency over 8-16 solves).
    ``run1()`` must dispatch exactly one solve, force a host transfer, and
    return its step count. Median of per-call rates: tunnel noise is
    one-sided (stalls only ever slow a call down)."""
    run1()  # warmup/compile
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        steps = run1()
        rates.append(steps / (time.perf_counter() - t0))
    return float(np.median(rates))


def paired_steady(results, metric, run1):
    """Append the steady-state row PAIRED with a chained row (same config,
    same jitted solve, unchained dispatch). Returns the appended row dict so
    callers can attach details without positional results[-1] coupling."""
    row = {
        "metric": metric + " [STEADY-STATE: one solve/dispatch, host sync]",
        "value": round(steady_rate(run1), 1), "unit": "steps/sec",
    }
    results.append(row)
    return row


def bench_rk4_vdp(results):
    """Config 2: fixed-step RK4, Van der Pol batch."""
    B, n_steps = 4096, 1000
    m = VanDerPol(mu=1.5)
    y0 = jnp.asarray(
        np.random.default_rng(0).uniform(-2, 2, (B, 2)), jnp.float32
    )

    @jax.jit
    def run(y0):
        sol = ensemble_solve(
            m.rhs, y0, 0.0, 10.0, stepper=vo.RungeKutta(vo.RK4),
            adaptive=False, h0=10.0 / n_steps, time_dtype=jnp.float32,
        )
        return sol.n_accept, sol.y_final

    def sync():
        na, yf = run(y0)
        return int(np.asarray(na).sum()), float(np.asarray(yf[0, 0]))

    wall, (steps, _) = timed(sync)
    results.append({
        "metric": f"fixed RK4 steps/sec, VdP {B}-trajectory batch",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def bench_headline_interleave(results):
    """VERDICT r3 #6 A/B: the headline RK loop kernel's opt-in
    ``stage_interleave`` (split each tile into N independent row blocks
    whose 6-stage chains issue alternately, overlapping the MXU stage
    dependency stalls; ops/pallas_rk.py). Same DrivenDense config as
    bench.py's headline at B=4096, chained x8/dispatch; results are
    bitwise-identical across interleave factors, so any delta is pure
    pipeline overlap."""
    import dataclasses

    from vec_ode_tpu.models import DrivenDense
    from vec_ode_tpu.ops.pallas_rk import FusedModulatedLinearRK

    B, d = 4096, 64
    model = DrivenDense.make(d=d, seed=0)
    rng = np.random.default_rng(42)
    psi0 = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)
    ctl = vo.StepControl(rtol=1e-8, min_dt=1e-6, max_dt=0.25)
    base = FusedModulatedLinearRK.from_driven_dense(model, jnp.float32)
    REPS = 8

    detail = {}
    for k in (1, 2, 4):
        stepper = dataclasses.replace(base, stage_interleave=k)

        @jax.jit
        def run(y0, stepper=stepper):
            def body(y, _):
                sol = ensemble_solve(
                    None, y, 0.0, 1.0, stepper=stepper, ctl=ctl,
                    h0=1e-3, adaptive=True, time_dtype=jnp.float32,
                )
                n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                     axis=-1, keepdims=True))
                y2 = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
                return y2, sol.n_accept
            yf, na = jax.lax.scan(body, y0, None, length=REPS)
            return na, yf

        def sync(run=run):
            na, yf = run(y0)
            return int(np.asarray(na).sum()), float(np.asarray(yf.re[0, 0]))

        wall, (steps, _) = timed(sync)
        detail[f"interleave={k}"] = round(steps / wall, 1)

    results.append({
        "metric": f"adaptive RKF45 steps/sec, DrivenDense {B}x{d}c "
                  "(loop kernel stage_interleave A/B, chained x8; "
                  "value = default interleave=1, deltas are tunnel noise)",
        "value": detail["interleave=1"], "unit": "steps/sec",
        "detail": detail,
    })


def bench_magnus2_lz(results):
    """Config 3: exponential midpoint on Landau-Zener sweeps (pair rep)."""
    B = 1024
    lz = LandauZener(v=2.0, delta=0.4)
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    n_steps = 2000

    @jax.jit
    def run(y0):
        sol = ensemble_solve(
            lambda t: lz.op_pair(t, jnp.float32), y0, -20.0, 20.0,
            stepper=vexp.ExpMidpoint(vexp.DenseCplxSplit()),
            adaptive=False, h0=40.0 / n_steps, time_dtype=jnp.float32,
        )
        return sol.n_accept, sol.y_final

    def sync():
        na, yf = run(y0)
        return int(np.asarray(na).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    results.append({
        "metric": f"Magnus-2 Landau-Zener steps/sec, {B} sweeps "
                  "(per-trajectory 2x2 expm)",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def bench_magnus2_lz_packed(results):
    """Config 3 on the LANE-PACKED fused loop: the same 2-level sweep as a
    ModulatedOperator, G = 128/D = 32 trajectories per kernel row over a
    block-diagonal basis — the whole 2000-iteration solve is ONE persistent
    kernel launch (exp/modulated.py:_fused_loop_run)."""
    B = 1024
    lz = LandauZener(v=2.0, delta=0.4)
    mod = lz.modulated(jnp.float32)
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    n_steps = 2000
    stepper = vexp.MidpointModulated(mod)
    path = stepper.fused_loop_solve(
        y0, jnp.asarray([-20.0, 20.0], jnp.float32), 40.0 / n_steps,
        ctl=vo.StepControl(rtol=1e-6, max_steps=4 * n_steps),
        adaptive=False,
    )
    assert path is not None and path.path.endswith("-packed"), (
        "packed fused loop did not engage")

    @jax.jit
    def run(y0):
        sol = ensemble_solve(
            mod, y0, -20.0, 20.0, stepper=stepper,
            adaptive=False, h0=40.0 / n_steps, time_dtype=jnp.float32,
        )
        return sol.n_accept, sol.y_final

    def sync():
        na, yf = run(y0)
        return int(np.asarray(na).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    results.append({
        "metric": f"Magnus-2 Landau-Zener steps/sec, {B} sweeps "
                  "(lane-packed persistent kernel, G=32)",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def bench_magnus4_lz_packed(results):
    """ADAPTIVE lane-packed fused loop on the 2-level sweep: per-trajectory
    step control runs in the packed carry columns (ops/pallas_loop.py
    group mode)."""
    B = 1024
    lz = LandauZener(v=2.0, delta=0.4)
    mod = lz.modulated(jnp.float32)
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    ctl = vo.StepControl(rtol=1e-5, max_steps=20000)
    stepper = vexp.MagnusModulated4(mod)
    probe = stepper.fused_loop_solve(
        y0, jnp.asarray([-20.0, 20.0], jnp.float32), 0.05, ctl=ctl,
        adaptive=True,
    )
    assert probe is not None and probe.path.endswith("-packed"), (
        "packed fused loop did not engage")

    @jax.jit
    def run(y0):
        # chain 8 solves per dispatch: amortizes the ~100 ms tunnel
        # dispatch latency (same methodology as the modulated rows)
        def body(carry, _):
            y, acc = carry
            sol = ensemble_solve(
                mod, y, -20.0, 20.0, stepper=stepper, ctl=ctl,
                h0=0.05, time_dtype=jnp.float32,
            )
            n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                 axis=-1, keepdims=True))
            yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
            return (yn, acc + sol.n_iters), None

        zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
        (yf, acc), _ = jax.lax.scan(body, (y0, zeros), None, length=8)
        return acc, yf

    def sync():
        it, yf = run(y0)
        return int(np.asarray(it).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    metric = (f"adaptive Magnus-4 Landau-Zener steps/sec, {B} sweeps "
              "(lane-packed, per-trajectory control in-kernel)")
    results.append({
        "metric": metric + " [chained: 8 solves/dispatch]",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })

    @jax.jit
    def run_one(y0):
        sol = ensemble_solve(
            mod, y0, -20.0, 20.0, stepper=stepper, ctl=ctl,
            h0=0.05, time_dtype=jnp.float32,
        )
        return sol.n_iters, sol.y_final

    def run1():
        it, yf = run_one(y0)
        np.asarray(yf.re)  # host transfer = the only reliable barrier
        return int(np.asarray(it).sum())

    paired_steady(results, metric, run1)


def bench_lz_blackbox_auto(results):
    """The reference's OPAQUE operator contract on its bread-and-butter
    problem: op_fn is a black-box callback (magnus.rs:32); auto_modulated
    recovers the 2-term structure AND Chebyshev-fits the coefficients
    into a kernel view (exp/auto.py:_fit_coeff_cols), so the whole solve
    lane-packs into one persistent kernel launch."""
    B = 1024
    lz = LandauZener(v=2.0, delta=0.4)
    mod = vexp.auto_modulated(
        lambda t: lz.op_pair(t, jnp.float32), -20.0, 20.0,
        dtype=jnp.float32)
    assert mod is not None and mod.coeff_cols_fn is not None
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    ctl = vo.StepControl(rtol=1e-5, max_steps=20000)
    stepper = vexp.MagnusModulated4(mod)
    probe = stepper.fused_loop_solve(
        y0, jnp.asarray([-20.0, 20.0], jnp.float32), 0.05, ctl=ctl,
        adaptive=True)
    assert probe is not None and probe.path.endswith("-packed"), (
        "packed fused loop did not engage for the auto-structured op")

    @jax.jit
    def run(y0):
        # chain 8 solves per dispatch: amortizes the ~100 ms tunnel
        # dispatch latency (same methodology as the modulated rows)
        def body(carry, _):
            y, acc = carry
            sol = ensemble_solve(
                mod, y, -20.0, 20.0, stepper=stepper, ctl=ctl,
                h0=0.05, time_dtype=jnp.float32,
            )
            n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                 axis=-1, keepdims=True))
            yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
            return (yn, acc + sol.n_iters), None

        zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
        (yf, acc), _ = jax.lax.scan(body, (y0, zeros), None, length=8)
        return acc, yf

    def sync():
        it, yf = run(y0)
        return int(np.asarray(it).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    metric = (f"adaptive Magnus-4 Landau-Zener steps/sec, {B} sweeps, "
              "BLACK-BOX op_fn (auto_modulated + Chebyshev cols, "
              "lane-packed kernel)")
    results.append({
        "metric": metric + " [chained: 8 solves/dispatch]",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })

    @jax.jit
    def run_one(y0):
        sol = ensemble_solve(
            mod, y0, -20.0, 20.0, stepper=stepper, ctl=ctl,
            h0=0.05, time_dtype=jnp.float32,
        )
        return sol.n_iters, sol.y_final

    def run1():
        it, yf = run_one(y0)
        np.asarray(yf.re)
        return int(np.asarray(it).sum())

    paired_steady(results, metric, run1)


def bench_adjoint_smalld(results):
    """Reversible adjoint on a d=2 pulse-control problem: both whole
    sweeps run as single LANE-PACKED kernel launches
    (diff.py:_adjoint_core sweep packing, G=32). Cold compile of this
    program is erratically slow through the tunnel (the 106s-then-0.4s
    gotcha) — give it a few minutes on a fresh cache."""
    from vec_ode_tpu import diff

    sx = jnp.asarray([[0.0, 1.0], [1.0, 0.0]], jnp.float32)
    sz = jnp.asarray([[1.0, 0.0], [0.0, -1.0]], jnp.float32)
    basis = cp.Cplx(jnp.zeros((2, 2, 2), jnp.float32),
                    -jnp.stack([sx, sz]))

    def coeff_fn(t, th):
        t = jnp.asarray(t)
        return jnp.stack(
            [jnp.ones_like(t), th[0] * jnp.cos(th[1] * t)], axis=-1)

    B, n = 1024, 256
    rng = np.random.default_rng(11)
    psi = rng.standard_normal((B, 2)) + 1j * rng.standard_normal((B, 2))
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi.astype(np.complex64), jnp.float32)
    theta = jnp.asarray([0.6, 1.3], jnp.float32)

    @jax.jit
    def vg(th):
        def loss(th):
            yf = diff.adjoint_solve(basis, coeff_fn, th, y0, 0.0, 1.5, n,
                                    order=4)
            return jnp.sum(yf.re ** 2 + yf.re * yf.im)
        return jax.value_and_grad(loss)(th)

    def sync():
        v, g = vg(theta)
        return B * n, float(np.asarray(g)[0])

    wall, (steps, _) = timed(sync)
    results.append({
        "metric": f"reversible-adjoint value_and_grad steps/sec, {B}x2c "
                  f"pulse control, n={n} (lane-packed sweep kernels)",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def bench_cfm4_driven(results):
    """Config 4: adaptive CFM-4 with GL-2 quadrature, 64-dim complex."""
    B = 256
    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(1)
    psi0 = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)

    stepper = vexp.CFM4(vexp.DenseCplxSplit())
    ctl = vo.StepControl(rtol=1e-5, min_dt=1e-5, max_dt=0.25)

    @jax.jit
    def run(y0):
        def body(carry, _):
            y, acc = carry
            sol = ensemble_solve(
                lambda t: model.op_pair(t, jnp.float32), y, 0.0, 1.0,
                stepper=stepper, adaptive=True, ctl=ctl,
                h0=1e-2, time_dtype=jnp.float32,
            )
            n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                 axis=-1, keepdims=True))
            yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
            return (yn, acc + sol.n_accept), None

        zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
        (yf, acc), _ = jax.lax.scan(body, (y0, zeros), None, length=16)
        return acc, yf

    def sync():
        na, yf = run(y0)
        return int(np.asarray(na).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    results.append({
        "metric": f"adaptive CFM-4 (GL2) steps/sec, {B}x64-dim complex "
                  "(batched stacked expm, 2+1 exps/step)",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def bench_magnus4_driven(results):
    """Adaptive Magnus-4 with commutator, 64-dim complex."""
    B = 256
    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(2)
    psi0 = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)

    stepper = vexp.Magnus4(vexp.DenseCplxSplit())
    ctl = vo.StepControl(rtol=1e-5, min_dt=1e-5, max_dt=0.25)

    @jax.jit
    def run(y0):
        def body(carry, _):
            y, acc = carry
            sol = ensemble_solve(
                lambda t: model.op_pair(t, jnp.float32), y, 0.0, 1.0,
                stepper=stepper, adaptive=True, ctl=ctl,
                h0=1e-2, time_dtype=jnp.float32,
            )
            n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                 axis=-1, keepdims=True))
            yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
            return (yn, acc + sol.n_accept), None

        zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
        (yf, acc), _ = jax.lax.scan(body, (y0, zeros), None, length=16)
        return acc, yf

    def sync():
        na, yf = run(y0)
        return int(np.asarray(na).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    metric = (f"adaptive Magnus-4 steps/sec, {B}x64-dim complex "
              "(batched commutator + stacked expm pair)")
    results.append({
        "metric": metric + " [chained: 16 solves/dispatch]",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })

    @jax.jit
    def run_one(y):
        sol = ensemble_solve(
            lambda t: model.op_pair(t, jnp.float32), y, 0.0, 1.0,
            stepper=stepper, adaptive=True, ctl=ctl,
            h0=1e-2, time_dtype=jnp.float32,
        )
        return sol.n_accept, sol.y_final

    def run1():
        na, yf = run_one(y0)
        np.asarray(yf.re)
        return int(np.asarray(na).sum())

    paired_steady(results, metric, run1)



def bench_magnus4_driven_fast(results):
    """Generic adaptive Magnus-4 with fast_error: the order-2 comparison
    propagator is replaced by the w2*xf estimate (exp/magnus.py), halving
    the per-step batched-expm stack on the black-box dense path."""
    B = 256
    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(2)
    psi0 = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)

    stepper = vexp.Magnus4(vexp.DenseCplxSplit(), fast_error=True)
    ctl = vo.StepControl(rtol=1e-5, min_dt=1e-5, max_dt=0.25)

    @jax.jit
    def run(y0):
        def body(carry, _):
            y, acc = carry
            sol = ensemble_solve(
                lambda t: model.op_pair(t, jnp.float32), y, 0.0, 1.0,
                stepper=stepper, adaptive=True, ctl=ctl,
                h0=1e-2, time_dtype=jnp.float32,
            )
            n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                 axis=-1, keepdims=True))
            yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
            return (yn, acc + sol.n_accept), None

        zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
        (yf, acc), _ = jax.lax.scan(body, (y0, zeros), None, length=16)
        return acc, yf

    def sync():
        na, yf = run(y0)
        return int(np.asarray(na).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    results.append({
        "metric": f"adaptive Magnus-4 steps/sec, {B}x64-dim complex "
                  "(fast_error: single-expm adaptive step)",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def _bench_modulated(results, make_stepper, label, B=256, length=16):
    """Shared harness: adaptive exp integrator on the Bx64-dim driven
    Hamiltonian via the modulated shared-basis fast path (exp/modulated.py).

    ``length`` solves are chained inside one jitted scan: the tunnel's
    ~60 ms fixed per-dispatch latency would otherwise dominate (at B=256 a
    whole solve is ~1.5 ms of device time) — the chained aggregate is the
    sustained device rate, still conservatively INCLUDING one dispatch."""
    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(3)
    psi0 = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)

    stepper = make_stepper(model.modulated(jnp.float32))
    ctl = vo.StepControl(rtol=1e-5, min_dt=1e-5, max_dt=0.25)

    @jax.jit
    def run(y0):
        def body(carry, _):
            y, acc = carry
            sol = ensemble_solve(
                None, y, 0.0, 1.0,
                stepper=stepper, adaptive=True, ctl=ctl,
                h0=1e-2, time_dtype=jnp.float32,
            )
            n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                 axis=-1, keepdims=True))
            yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
            return (yn, acc + sol.n_accept), None

        zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
        (yf, acc), _ = jax.lax.scan(body, (y0, zeros), None, length=length)
        return acc, yf

    def sync():
        na, yf = run(y0)
        return int(np.asarray(na).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    metric = (f"{label}, {B}x64-dim complex (modulated shared-basis "
              "Taylor action, no per-trajectory expm)")
    results.append({
        "metric": metric + f" [chained: {length} solves/dispatch]",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })

    @jax.jit
    def run_one(y):
        sol = ensemble_solve(
            None, y, 0.0, 1.0, stepper=stepper, adaptive=True, ctl=ctl,
            h0=1e-2, time_dtype=jnp.float32,
        )
        return sol.n_accept, sol.y_final

    def run1():
        na, yf = run_one(y0)
        np.asarray(yf.re)
        return int(np.asarray(na).sum())

    paired_steady(results, metric, run1)


def bench_magnus4_auto_structured(results, B=256, length=16):
    """The reference's BLACK-BOX operator contract (magnus.rs:32) routed
    through exp.auto_modulated: structure is recovered from op_fn samples
    at setup, then the solve runs on the shared-basis fast path — same
    problem and tolerances as the generic magnus4_driven row."""
    model = DrivenDense.make(d=64, seed=0)
    op_fn = lambda t: model.op_pair(t, jnp.float32)
    mod = vexp.auto_modulated(op_fn, 0.0, 1.0)
    assert mod is not None and mod.n_terms == 2
    rng = np.random.default_rng(2)
    psi0 = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)

    stepper = vexp.MagnusModulated4(mod)
    ctl = vo.StepControl(rtol=1e-5, min_dt=1e-5, max_dt=0.25)

    @jax.jit
    def run(y0):
        def body(carry, _):
            y, acc = carry
            sol = ensemble_solve(
                None, y, 0.0, 1.0, stepper=stepper, adaptive=True, ctl=ctl,
                h0=1e-2, time_dtype=jnp.float32,
            )
            n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                 axis=-1, keepdims=True))
            yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
            return (yn, acc + sol.n_accept), None

        zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
        (yf, acc), _ = jax.lax.scan(body, (y0, zeros), None, length=length)
        return acc, yf

    def sync():
        na, yf = run(y0)
        return int(np.asarray(na).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    results.append({
        "metric": f"adaptive Magnus-4 steps/sec, {B}x64-dim complex, "
                  "BLACK-BOX op_fn via auto_modulated (recovered "
                  "shared-basis fast path)",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def bench_magnus4_modulated_fast(results):
    """Modulated Magnus-4 with fast_error: ONE Taylor chain + one basis
    contraction per adaptive step (vs the pair's two chains) — expected
    ~1.6-1.8x the pair rate at identical order (different error
    constant; exact parity with the generic fast_error semantics)."""
    _bench_modulated(
        results,
        lambda mod: vexp.MagnusModulated4(mod, fast_error=True),
        "adaptive Magnus-4 FAST_ERROR",
    )


def bench_cfm4_modulated(results):
    _bench_modulated(
        results, lambda mod: vexp.CFM4Modulated(mod),
        "adaptive CFM-4 (GL2) steps/sec",
    )


def bench_magnus4_modulated(results):
    _bench_modulated(
        results, lambda mod: vexp.MagnusModulated4(mod),
        "adaptive Magnus-4 steps/sec",
    )


def bench_magnus6_modulated(results):
    _bench_modulated(
        results, lambda mod: vexp.MagnusModulated6(mod),
        "adaptive Magnus-6 (Yoshida) steps/sec",
    )


def bench_magnus4_modulated_4k(results):
    _bench_modulated(
        results, lambda mod: vexp.MagnusModulated4(mod),
        "adaptive Magnus-4 steps/sec", B=4096,
    )


def bench_lindblad(results, B=256, d=8, length=16):
    """Open-system throughput: adaptive Magnus-4 on the vectorized Lindblad
    superoperator (2d² = 128 widened dim = one MXU tile at d=8)."""
    from vec_ode_tpu.models import Lindblad

    lb = Lindblad.make(d=d, seed=9, gamma=0.2)
    u_fn = lambda t: 0.8 * jnp.sin(2.1 * jnp.asarray(t))
    mod = lb.modulated(u_fn, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    # random valid density matrices: rho = V V† / tr
    V = rng.standard_normal((B, d, d)) + 1j * rng.standard_normal((B, d, d))
    rho = np.einsum("bij,bkj->bik", V, V.conj())
    rho /= np.trace(rho, axis1=-2, axis2=-1)[:, None, None]
    y0 = Lindblad.vec_rho(rho, jnp.float32)

    stepper = vexp.MagnusModulated4(mod)
    ctl = vo.StepControl(rtol=1e-5, min_dt=1e-5, max_dt=0.25)

    @jax.jit
    def run(y0):
        def body(carry, _):
            y, acc = carry
            sol = ensemble_solve(
                None, y, 0.0, 1.0, stepper=stepper, adaptive=True, ctl=ctl,
                h0=1e-2, time_dtype=jnp.float32,
            )
            return (sol.y_final, acc + sol.n_accept), None

        zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
        (yf, acc), _ = jax.lax.scan(body, (y0, zeros), None, length=length)
        return acc, yf

    def sync():
        na, yf = run(y0)
        return int(np.asarray(na).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    results.append({
        "metric": f"adaptive Magnus-4 Lindblad steps/sec, {B} open-system "
                  f"trajectories d={d} (vectorized superoperator, "
                  "modulated fast path)",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def bench_adjoint_grad(results, B=256, d=64, n_steps=256, length=4):
    """Reversible-adjoint gradient throughput: value_and_grad of a transfer
    fidelity through a full fixed-step Magnus-4 solve (forward + backward
    reconstruction + Fréchet cotangents, all Pallas chain actions).
    Reported as integration steps/sec counting forward AND backward sweeps
    (2*n_steps per solve); ``length`` losses chained per dispatch."""
    from vec_ode_tpu.models import PulseControl

    pc = PulseControl.make(d=d, seed=0, T=1.0, n_modes=6)
    rng = np.random.default_rng(3)
    psi0 = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    tgt = np.roll(psi0, 1, axis=-1)
    y0 = cp.from_complex(psi0, jnp.float32)
    tg = cp.from_complex(tgt, jnp.float32)
    theta = jnp.full((6,), 0.1, jnp.float32)

    vg = jax.value_and_grad(
        lambda th: pc.infidelity(th, y0, tg, n_steps=n_steps,
                                 dtype=jnp.float32))

    @jax.jit
    def run(th):
        def body(t, _):
            v, g = vg(t)
            return t - 1e-3 * g, v

        thf, vs = jax.lax.scan(body, th, None, length=length)
        return thf, vs

    def sync():
        thf, vs = run(theta)
        return float(np.asarray(vs[-1])), np.asarray(thf)

    wall, _ = timed(sync)
    steps = 2 * n_steps * B * length
    results.append({
        "metric": f"adjoint value_and_grad steps/sec, {B}x{d}-dim complex, "
                  f"Magnus-4 n_steps={n_steps} (fwd+bwd counted)",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def bench_fit_loop(results, B=256, d=64, n_steps=256, n_iters=8):
    """On-device optimizer loop (diff.make_fit_loop): n_iters iterations of
    value_and_grad(adjoint infidelity) + Adam inside ONE dispatch, vs the
    host loop a user would otherwise write (one dispatch per iteration,
    host-synced — the steady-state pattern). Same config as adjoint_grad so
    the chained-adjoint number is directly comparable (VERDICT r4 #2: the
    fit_loop rate should sit within ~2x of the chained adjoint rate)."""
    import optax

    from vec_ode_tpu.diff import make_fit_loop
    from vec_ode_tpu.models import PulseControl

    pc = PulseControl.make(d=d, seed=0, T=1.0, n_modes=6)
    rng = np.random.default_rng(3)
    psi0 = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    tgt = np.roll(psi0, 1, axis=-1)
    y0 = cp.from_complex(psi0, jnp.float32)
    tg = cp.from_complex(tgt, jnp.float32)
    theta = jnp.full((6,), 0.1, jnp.float32)

    loss = lambda th: pc.infidelity(th, y0, tg, n_steps=n_steps,  # noqa: E731
                                    dtype=jnp.float32)
    fit = make_fit_loop(loss, optax.adam(0.05), n_iters=n_iters)

    def sync():
        res = fit(theta)
        return float(np.asarray(res.losses[-1]))

    wall, last = timed(sync)
    steps = 2 * n_steps * B * n_iters  # fwd+bwd, matching adjoint_grad
    results.append({
        "metric": f"fit_loop on-device Adam steps/sec, {B}x{d}-dim complex, "
                  f"Magnus-4 adjoint n_steps={n_steps}, {n_iters} iters "
                  "in ONE dispatch (fwd+bwd counted)",
        "value": round(steps / wall, 1), "unit": "steps/sec",
        "detail": {"iters_per_sec": round(n_iters / wall, 3),
                   "final_loss": last},
    })

    # the host loop fit_loop replaces: one value_and_grad + update per
    # dispatch, host-synced (what a user's optimizer loop costs today)
    vg = jax.jit(jax.value_and_grad(loss))

    def run1():
        v, g = vg(theta)
        float(np.asarray(v))
        return 2 * n_steps * B

    paired_steady(
        results,
        f"host-loop value_and_grad steps/sec, {B}x{d}-dim complex, "
        f"Magnus-4 adjoint n_steps={n_steps}",
        run1)


def bench_compensated(results, B=256, d=64):
    """Compensated double-f32 state tier (comp.py, VERDICT r4 #1): what the
    (hi, lo) pair + increment-form propagation COSTS at the standard
    rtol=1e-5 row config, and what it BUYS — adaptive control at rtol=1e-8,
    where plain f32 reject-storms on the eps*|y| estimator noise floor, and
    adaptive Magnus-6 at rtol=1e-8, where plain f32 is ERR_MAX_STEPS."""
    model = DrivenDense.make(d=d, seed=0)
    rng = np.random.default_rng(2)
    psi0 = rng.standard_normal((B, d)) + 1j * rng.standard_normal((B, d))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)

    def rate_and_counts(stepper, rtol, length=8):
        ctl = vo.StepControl(rtol=rtol, min_dt=1e-6, max_dt=0.25,
                             max_steps=4000)

        @jax.jit
        def run(y0):
            def body(carry, _):
                y, acc, rej = carry
                sol = ensemble_solve(
                    lambda t: model.op_pair(t, jnp.float32), y, 0.0, 1.0,
                    stepper=stepper, adaptive=True, ctl=ctl,
                    h0=1e-2, time_dtype=jnp.float32,
                )
                n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                     axis=-1, keepdims=True))
                yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
                return (yn, acc + sol.n_accept, rej + sol.n_reject), None

            zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
            (yf, acc, rej), _ = jax.lax.scan(
                body, (y0, zeros, zeros), None, length=length)
            return acc, rej, yf

        def sync():
            na, nr, yf = run(y0)
            np.asarray(yf.re)
            return int(np.asarray(na).sum()), int(np.asarray(nr).sum())

        wall, (steps, rejects) = timed(sync)
        return steps / wall, steps, rejects

    # cost at the standard row config (rtol=1e-5): plain vs compensated
    r_plain, _, rej_p = rate_and_counts(
        vexp.Magnus4(vexp.DenseCplxSplit()), 1e-5)
    r_comp, _, rej_c = rate_and_counts(
        vexp.Magnus4(vexp.DenseCplxSplit(), compensated=True), 1e-5)
    results.append({
        "metric": f"compensated Magnus-4 steps/sec, {B}x{d}-dim complex, "
                  "rtol=1e-5 [chained: 8 solves/dispatch] — COST row",
        "value": round(r_comp, 1), "unit": "steps/sec",
        "detail": {"plain_f32_rate": round(r_plain, 1),
                   "relative_cost": round(r_plain / r_comp, 3),
                   "rejects_plain": rej_p, "rejects_comp": rej_c},
    })

    # capability at rtol=1e-8: plain f32 reject-storms on estimator noise
    r_plain8, st_p8, rej_p8 = rate_and_counts(
        vexp.Magnus4(vexp.DenseCplxSplit()), 1e-8, length=4)
    r_comp8, st_c8, rej_c8 = rate_and_counts(
        vexp.Magnus4(vexp.DenseCplxSplit(), compensated=True), 1e-8,
        length=4)
    results.append({
        "metric": f"compensated Magnus-4 steps/sec, {B}x{d}-dim complex, "
                  "rtol=1e-8 [chained: 4 solves/dispatch] — CAPABILITY row",
        "value": round(r_comp8, 1), "unit": "steps/sec",
        "detail": {"plain_f32_rate": round(r_plain8, 1),
                   "accepts_plain": st_p8, "rejects_plain": rej_p8,
                   "accepts_comp": st_c8, "rejects_comp": rej_c8},
    })

    # Magnus-6 at rtol=1e-8: plain f32 is ERR_MAX_STEPS (estimator floor
    # ~1e-7); compensated completes (single bounded solve, one dispatch)
    ctl6 = vo.StepControl(rtol=1e-8, min_dt=1e-6, max_dt=0.25,
                          max_steps=2000)

    @jax.jit
    def run_m6(y0):
        st = vexp.Magnus6(vexp.DenseCplxSplit(), compensated=True)
        sol = ensemble_solve(
            lambda t: model.op_pair(t, jnp.float32), y0, 0.0, 1.0,
            stepper=st, adaptive=True, ctl=ctl6, h0=1e-2,
            time_dtype=jnp.float32,
        )
        return sol.status, sol.n_accept, sol.n_reject

    s_c, na_c, nr_c = run_m6(y0)
    done_frac = float(np.mean(np.asarray(s_c) == vo.DONE))
    results.append({
        "metric": f"compensated adaptive Magnus-6 rtol=1e-8, {B}x{d}-dim "
                  "complex: DONE fraction (plain f32 is ERR_MAX_STEPS here)",
        "value": done_frac, "unit": "fraction DONE",
        "detail": {"median_accepts": int(np.median(np.asarray(na_c))),
                   "median_rejects": int(np.median(np.asarray(nr_c)))},
    })


def bench_lz_sweep_efficiency(results):
    """Straggler accounting on a heterogeneous Landau-Zener sweep: plain
    batched loop vs host-compacted re-batching (VERDICT r1 item 6)."""
    from vec_ode_tpu.parallel import ensemble_solve_compact, step_efficiency

    B = 256
    vs = jnp.asarray(np.linspace(0.4, 8.0, B), jnp.float32)
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = (cp.from_complex(psi0, jnp.float32), vs[:, None])

    def rhs(t, y):
        psi, v = y
        sz = jnp.asarray([[0.5, 0.0], [0.0, -0.5]], jnp.float32)
        sx = jnp.asarray([[0.0, 0.5], [0.5, 0.0]], jnp.float32)
        H = sz * (v[0] * t) + 0.4 * sx
        return (cp.Cplx(H @ psi.im, -(H @ psi.re)), jnp.zeros_like(v))

    ctl = vo.StepControl(rtol=1e-4, min_dt=1e-5, max_dt=0.5,
                         max_steps=100000)
    sol = ensemble_solve(rhs, y0, -8.0, 8.0, ctl=ctl, h0=1e-2,
                         time_dtype=jnp.float32)
    eff_plain = float(step_efficiency(sol))
    # mesh-composable accounting: what an 8-shard split of this batch
    # would waste per device, plain order vs cost-sorted placement
    # (parallel.cost_sorted_permutation; the velocities are already
    # monotone here, so the sorted number IS the placement-mitigated one)
    eff_8shard = float(step_efficiency(sol, n_shards=8))
    per_shard = [round(float(e), 4) for e in np.asarray(
        step_efficiency(sol, n_shards=8, per_shard=True))]

    t0 = time.perf_counter()
    sol_c, stats = ensemble_solve_compact(
        rhs, y0, -8.0, 8.0, ctl=ctl, h0=1e-2, time_dtype=jnp.float32,
        chunk_iters=16, min_batch=4, bucket_multiple=4,
    )
    wall = time.perf_counter() - t0
    results.append({
        "metric": f"LZ-sweep straggler efficiency, {B} heterogeneous "
                  "trajectories (useful/executed lane-iters)",
        "value": round(stats["efficiency"], 4), "unit": "fraction",
        "detail": {
            "plain_batched_efficiency": round(eff_plain, 4),
            "sorted_8shard_efficiency": round(eff_8shard, 4),
            "per_shard_efficiency": per_shard,
            "compact_wall_s": round(wall, 2),
            "useful_lane_iters": stats["useful_lane_iters"],
        },
    })


def bench_magnus4_lz_packed_fast(results):
    """Adaptive lane-packed LZ with fast_error: ONE Taylor chain + one
    commutator-basis contraction per step in the packed kernel (vs the
    pair's two chains) — expected close to the fixed-step packed rate."""
    B = 1024
    lz = LandauZener(v=2.0, delta=0.4)
    mod = lz.modulated(jnp.float32)
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    ctl = vo.StepControl(rtol=1e-5, max_steps=20000)
    stepper = vexp.MagnusModulated4(mod, fast_error=True)
    probe = stepper.fused_loop_solve(
        y0, jnp.asarray([-20.0, 20.0], jnp.float32), 0.05, ctl=ctl,
        adaptive=True,
    )
    assert probe is not None and probe.path.endswith("-packed")

    @jax.jit
    def run(y0):
        def body(carry, _):
            y, acc = carry
            sol = ensemble_solve(
                mod, y, -20.0, 20.0, stepper=stepper, ctl=ctl,
                h0=0.05, time_dtype=jnp.float32,
            )
            n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                 axis=-1, keepdims=True))
            yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
            return (yn, acc + sol.n_iters), None

        zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
        (yf, acc), _ = jax.lax.scan(body, (y0, zeros), None, length=8)
        return acc, yf

    def sync():
        it, yf = run(y0)
        return int(np.asarray(it).sum()), float(np.asarray(yf.re[0, 0]))

    wall, (steps, _) = timed(sync)
    results.append({
        "metric": f"adaptive Magnus-4 FAST_ERROR Landau-Zener steps/sec, "
                  f"{B} sweeps (lane-packed) [chained: 8/dispatch]",
        "value": round(steps / wall, 1), "unit": "steps/sec",
    })


def bench_magnus4_lz_events(results):
    """IN-KERNEL event detection (VERDICT r3 #2): the adaptive lane-packed
    LZ sweep with a TERMINAL population-threshold event (declared
    QuadraticObservable) stays on the persistent kernel; the same event as
    an opaque callable forces the XLA-driver fallback — both measured."""
    from vec_ode_tpu.events import Event, EventConfig, QuadraticObservable

    B = 1024
    lz = LandauZener(v=2.0, delta=0.4)
    mod = lz.modulated(jnp.float32)
    psi0 = np.zeros((B, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0 = cp.from_complex(psi0, jnp.float32)
    ctl = vo.StepControl(rtol=1e-5, max_steps=20000)
    obs = QuadraticObservable(q=[0.0, 1.0], c=0.05)
    ev_k = EventConfig(events=(Event(obs, direction=1, terminal=True),),
                       t_tol=1e-4)
    fn = lambda t, x: x.re[1] ** 2 + x.im[1] ** 2 - 0.05
    ev_x = EventConfig(events=(Event(fn, direction=1, terminal=True),),
                       t_tol=1e-4)
    stepper = vexp.MagnusModulated4(mod)
    probe = stepper.fused_loop_solve(
        y0, jnp.asarray([-20.0, 20.0], jnp.float32), 0.05, ctl=ctl,
        adaptive=True, events=ev_k)
    assert probe is not None and probe.path.endswith("-packed"), (
        "packed fused loop did not engage with in-kernel events")

    def make(ev):
        @jax.jit
        def run(y0):
            def body(carry, _):
                y, acc = carry
                sol = ensemble_solve(
                    mod, y, -20.0, 20.0, stepper=stepper, ctl=ctl,
                    h0=0.05, time_dtype=jnp.float32, events=ev,
                )
                return (y, acc + sol.n_iters), sol.event_t

            zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
            (_, acc), tev = jax.lax.scan(body, (y0, zeros), None, length=8)
            return acc, tev

        def sync():
            it, tev = run(y0)
            return int(np.asarray(it).sum()), float(np.asarray(tev)[0, 0, 0])

        return sync

    import warnings

    wall_k, (steps_k, t_k) = timed(make(ev_k))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        wall_x, (steps_x, t_x) = timed(make(ev_x))
    assert abs(t_k - t_x) < 1e-3, (t_k, t_x)
    metric = (f"adaptive Magnus-4 LZ steps/sec, {B} sweeps, TERMINAL "
              "population event IN-KERNEL (declared observable, "
              "lane-packed persistent kernel)")
    results.append({
        "metric": metric + " [chained: 8/dispatch]",
        "value": round(steps_k / wall_k, 1), "unit": "steps/sec",
        "detail": {
            "xla_fallback_opaque_callable": round(steps_x / wall_x, 1),
            "speedup": round((steps_k / wall_k) / (steps_x / wall_x), 2),
        },
    })

    def make_one(ev):
        @jax.jit
        def run_one(y0):
            sol = ensemble_solve(
                mod, y0, -20.0, 20.0, stepper=stepper, ctl=ctl,
                h0=0.05, time_dtype=jnp.float32, events=ev,
            )
            return sol.n_iters, sol.event_t

        def run1():
            it, tev = run_one(y0)
            np.asarray(tev)
            return int(np.asarray(it).sum())

        return run1

    row = paired_steady(results, metric, make_one(ev_k))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sx = steady_rate(make_one(ev_x))
    row["detail"] = {"xla_fallback_opaque_callable": round(sx, 1),
                     "speedup": round(row["value"] / sx, 2)}


def bench_dense_profile(results):
    """VERDICT r3 #3 profiling row: decompose the generic adaptive
    Magnus-4 step (256x64c, stacked-expm executor) into its phases, each
    timed as a chained scan over the SAME per-step shapes. Phases:
    sample (assemble+embed both nodes), commutator GEMM, stacked expm,
    matvec+norm. Prints per-phase ms/step so the gap to the ~0.78 ms GEMM
    floor is attributable."""
    B = 256
    model = DrivenDense.make(d=64, seed=0)
    rng = np.random.default_rng(2)
    psi0 = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)
    xw = jnp.concatenate([y0.re, y0.im], axis=1)

    from vec_ode_tpu.exp import DenseCplxSplit
    from vec_ode_tpu.exp import dense_fast as df
    from vec_ode_tpu.exp.magnus import _B2, _C_MID
    from vec_ode_tpu.ops.expm import expm
    from vec_ode_tpu.utils.prec import HIGHEST, mm

    split = DenseCplxSplit()
    assemble = jax.vmap(lambda t: model.op_pair(t, jnp.float32))
    t0v = jnp.linspace(0.0, 1.0, B).astype(jnp.float32)
    dtv = jnp.full((B,), 1e-2, jnp.float32)
    L = 64   # chained iterations per dispatch

    def chain(fn, x0):
        @jax.jit
        def run(x):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, x, None, length=L)
            return out
        def sync():
            r = run(x0)
            return float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        return sync

    def phase_sample(t):
        t12 = jnp.concatenate([t - _C_MID * dtv, t + _C_MID * dtv])
        E12 = df.embed_node(split, assemble(t12))
        return t + 1e-6 * E12[0, 0, 0]

    def phase_comm(t):
        t12 = jnp.concatenate([t - _C_MID * dtv, t + _C_MID * dtv])
        E12 = df.embed_node(split, assemble(t12))
        E1, E2 = E12[:B], E12[B:]
        P = mm(jnp.concatenate([E1, E2]), jnp.concatenate([E2, E1]))
        comm = P[:B] - P[B:]
        return t + 1e-6 * comm[0, 0, 0]

    def phase_expm(t):
        t12 = jnp.concatenate([t - _C_MID * dtv, t + _C_MID * dtv])
        E12 = df.embed_node(split, assemble(t12))
        E1, E2 = E12[:B], E12[B:]
        dt3 = dtv[:, None, None]
        P = mm(jnp.concatenate([E1, E2]), jnp.concatenate([E2, E1]))
        w1 = 0.5 * dt3 * (E1 + E2)
        omega = w1 + (_B2 * dt3 * dt3) * (P[:B] - P[B:])
        U = expm(jnp.concatenate([omega, w1]))
        return t + 1e-6 * U[0, 0, 0]

    def phase_full(t):
        t12 = jnp.concatenate([t - _C_MID * dtv, t + _C_MID * dtv])
        E12 = df.embed_node(split, assemble(t12))
        E1, E2 = E12[:B], E12[B:]
        dt3 = dtv[:, None, None]
        P = mm(jnp.concatenate([E1, E2]), jnp.concatenate([E2, E1]))
        w1 = 0.5 * dt3 * (E1 + E2)
        omega = w1 + (_B2 * dt3 * dt3) * (P[:B] - P[B:])
        U = expm(jnp.concatenate([omega, w1]))
        xs = jnp.concatenate([xw, xw])
        ys = jnp.einsum("...ij,...j->...i", U, xs, precision=HIGHEST)
        dv = ys[B:] - ys[:B]
        e = jnp.sqrt(jnp.sum(dv * dv, axis=-1))
        return t + 1e-6 * e[0]

    detail = {}
    prev = None
    for name, fn in [("sample", phase_sample), ("`+comm`", phase_comm),
                     ("+expm", phase_expm), ("+matvec+norm", phase_full)]:
        wall, _ = timed(chain(fn, t0v))
        ms = wall / L * 1e3
        detail[name] = {"ms_per_step": round(ms, 4),
                        "delta_ms": round(ms - prev, 4) if prev else None}
        prev = ms
    results.append({
        "metric": "generic adaptive Magnus-4 step phase profile, 256x64c "
                  "(chained x64/dispatch)",
        "value": detail["+matvec+norm"]["ms_per_step"], "unit": "ms/step",
        "detail": detail,
    })


def bench_dense_dispatch_floor(results):
    """r4: prove the dense 'sample' phase is DISPATCH-bound, not
    memory/compute-bound. Four scan bodies with 2-4x different bytes and
    FLOPs — assemble only, embed of a constant, one-node sample, the full
    two-node sample — measure identically (~360 us/step on the axon
    backend = ~4 launches x ~90 us), while the phase's memory floor is
    ~40 us. On a standard TPU runtime the phase collapses toward the
    memory floor and the default generic-dense executor projects to
    ~310K steps/s at 256x64c (BENCH.md round-4 dense section)."""
    B, L = 256, 64
    model = DrivenDense.make(d=64, seed=0)
    from vec_ode_tpu.exp import DenseCplxSplit
    from vec_ode_tpu.exp import dense_fast as df
    from vec_ode_tpu.exp.magnus import _C_MID

    split = DenseCplxSplit()
    assemble = jax.vmap(lambda t: model.op_pair(t, jnp.float32))
    t0v = jnp.linspace(0.0, 1.0, B).astype(jnp.float32)
    dtv = jnp.full((B,), 1e-2, jnp.float32)
    const_pair = assemble(t0v)

    def chain(fn):
        @jax.jit
        def run(t):
            out, _ = jax.lax.scan(lambda c, _: (fn(c), None), t, None,
                                  length=L)
            return out

        def sync():
            return float(np.asarray(run(t0v)).ravel()[0])

        return sync

    def a_only(t):
        la = assemble(jnp.concatenate([t - _C_MID * dtv, t + _C_MID * dtv]))
        return t + 1e-6 * la.re[0, 0, 0]

    def embed_const(t):
        E = df.embed_node(split, cp.Cplx(const_pair.re + t[0] * 1e-9,
                                         const_pair.im))
        return t + 1e-6 * E[0, 0, 0]

    def one_node(t):
        E = df.embed_node(split, assemble(t - _C_MID * dtv))
        return t + 1e-6 * E[0, 0, 0]

    def two_node(t):
        E = df.embed_node(split, assemble(
            jnp.concatenate([t - _C_MID * dtv, t + _C_MID * dtv])))
        return t + 1e-6 * E[0, 0, 0]

    detail = {}
    for name, fn in [("assemble_only_2B", a_only),
                     ("embed_const_B", embed_const),
                     ("sample_1node_B", one_node),
                     ("sample_2node_2B", two_node)]:
        wall, _ = timed(chain(fn))
        detail[name] = round(wall / L * 1e6, 1)
    results.append({
        "metric": "dense sample-phase dispatch floor, us/step for 4 bodies "
                  "with 2-4x different work (equal => dispatch-bound)",
        "value": detail["sample_2node_2B"], "unit": "us/step",
        "detail": detail,
    })


def bench_dense_output(results, B=256, n_save=8, length=8):
    """r5 (VERDICT r4 #4): dense OUTPUT on the fused loop — the persistent
    kernel records each interior save time's crossing-step endpoints
    in-kernel (free-running controller) and the cubic Hermite is evaluated
    post-hoc in XLA, vs the XLA dense driver (dense.integrate_interp)
    paying ~90 us/op/iteration for the same free-running semantics.
    Reference contract being beaten: ode.rs:165-176 truncates h at every
    save time; this path perturbs neither h nor throughput."""
    model = DrivenDense.make(d=64, seed=0)
    mod = model.modulated(jnp.float32)
    rng = np.random.default_rng(2)
    psi0 = rng.standard_normal((B, 64)) + 1j * rng.standard_normal((B, 64))
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)
    ctl = vo.StepControl(rtol=1e-5, min_dt=1e-5, max_dt=0.25)
    save = np.linspace(0.0, 1.0, n_save + 2)[1:-1]

    def make_run(stepper):
        @jax.jit
        def run(y0):
            def body(carry, _):
                y, acc, chk = carry
                sol = ensemble_solve(
                    None, y, 0.0, 1.0, stepper=stepper, adaptive=True,
                    ctl=ctl, h0=1e-2, save_at=save, dense=True,
                    time_dtype=jnp.float32,
                )
                n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                     axis=-1, keepdims=True))
                yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
                # consume the interpolated saves so the dense work can't DCE
                chk = chk + jnp.sum(sol.ys.re[:, 1:-1, 0])
                return (yn, acc + sol.n_accept, chk), None

            zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
            (yf, acc, chk), _ = jax.lax.scan(
                body, (y0, zeros, jnp.float32(0.0)), None, length=length)
            return acc, chk

        def sync():
            na, chk = run(y0)
            return int(np.asarray(na).sum()), float(np.asarray(chk))

        return sync

    st_k = vexp.MagnusModulated4(mod)
    st_x = vexp.MagnusModulated4(mod, use_pallas=False)
    # path check (eager, outside the timed jit)
    s = ensemble_solve(None, y0, 0.0, 1.0, stepper=st_k, adaptive=True,
                       ctl=ctl, h0=1e-2, save_at=save, dense=True,
                       time_dtype=jnp.float32)
    assert s.path == "pallas-loop-persistent-dense", s.path

    wall_k, (steps_k, _) = timed(make_run(st_k))
    wall_x, (steps_x, _) = timed(make_run(st_x))
    rate_k, rate_x = steps_k / wall_k, steps_x / wall_x
    results.append({
        "metric": f"adaptive Magnus-4 DENSE-OUTPUT steps/sec, {B}x64-dim "
                  f"complex, {n_save} free-running Hermite saves "
                  f"[chained: {length} solves/dispatch]",
        "value": round(rate_k, 1), "unit": "steps/sec",
        "detail": {"fused_kernel": round(rate_k, 1),
                   "xla_dense_driver": round(rate_x, 1),
                   "speedup": round(rate_k / rate_x, 2)},
    })

    # the reference's bread-and-butter regime: 2-level sweeps, lane-packed
    # G=32 — the XLA dense driver's per-iteration dispatch floor advances
    # only B trajectories of d=2 per ~4-op round trip, while the packed
    # kernel keeps its tens-of-millions rate
    Bp = 1024
    lz = LandauZener(v=2.0, delta=0.4).modulated(jnp.float32)
    psi0 = np.zeros((Bp, 2), np.complex64)
    psi0[:, 0] = 1.0
    y0p = cp.from_complex(psi0, jnp.float32)
    savep = np.linspace(-20.0, 20.0, n_save + 2)[1:-1]
    ctlp = vo.StepControl(rtol=1e-5, max_steps=20000)

    def make_run_p(stepper):
        @jax.jit
        def run(y0):
            def body(carry, _):
                y, acc, chk = carry
                sol = ensemble_solve(
                    None, y, -20.0, 20.0, stepper=stepper, adaptive=True,
                    ctl=ctlp, h0=0.05, save_at=savep, dense=True,
                    time_dtype=jnp.float32,
                )
                n = jnp.sqrt(jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                                     axis=-1, keepdims=True))
                yn = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
                chk = chk + jnp.sum(sol.ys.re[:, 1:-1, 0])
                return (yn, acc + sol.n_accept, chk), None

            zeros = jnp.zeros((y0.re.shape[0],), jnp.int32)
            (yf, acc, chk), _ = jax.lax.scan(
                body, (y0, zeros, jnp.float32(0.0)), None, length=length)
            return acc, chk

        def sync():
            na, chk = run(y0p)
            return int(np.asarray(na).sum()), float(np.asarray(chk))

        return sync

    stp_k = vexp.MagnusModulated4(lz)
    stp_x = vexp.MagnusModulated4(lz, use_pallas=False)
    s = ensemble_solve(None, y0p, -20.0, 20.0, stepper=stp_k, adaptive=True,
                       ctl=ctlp, h0=0.05, save_at=savep, dense=True,
                       time_dtype=jnp.float32)
    assert s.path == "pallas-loop-persistent-packed-dense", s.path

    wall_pk, (steps_pk, _) = timed(make_run_p(stp_k))
    wall_px, (steps_px, _) = timed(make_run_p(stp_x))
    rate_pk, rate_px = steps_pk / wall_pk, steps_px / wall_px
    results.append({
        "metric": f"adaptive Magnus-4 DENSE-OUTPUT steps/sec, {Bp} "
                  f"Landau-Zener sweeps (lane-packed G=32), {n_save} "
                  f"free-running Hermite saves "
                  f"[chained: {length} solves/dispatch]",
        "value": round(rate_pk, 1), "unit": "steps/sec",
        "detail": {"fused_kernel_packed": round(rate_pk, 1),
                   "xla_dense_driver": round(rate_px, 1),
                   "speedup": round(rate_pk / rate_px, 2)},
    })


ALL = {
    "rk4_vdp": bench_rk4_vdp,
    "headline_interleave": bench_headline_interleave,
    "magnus2_lz": bench_magnus2_lz,
    "magnus2_lz_packed": bench_magnus2_lz_packed,
    "magnus4_lz_packed": bench_magnus4_lz_packed,
    "magnus4_lz_packed_fast": bench_magnus4_lz_packed_fast,
    "magnus4_lz_events": bench_magnus4_lz_events,
    "lz_blackbox_auto": bench_lz_blackbox_auto,
    "adjoint_smalld": bench_adjoint_smalld,
    "cfm4_driven": bench_cfm4_driven,
    "magnus4_driven": bench_magnus4_driven,
    "magnus4_driven_fast": bench_magnus4_driven_fast,
    "dense_profile": bench_dense_profile,
    "dense_dispatch_floor": bench_dense_dispatch_floor,
    "dense_output": bench_dense_output,
    "magnus4_auto": bench_magnus4_auto_structured,
    "cfm4_modulated": bench_cfm4_modulated,
    "magnus4_modulated": bench_magnus4_modulated,
    "magnus4_modulated_fast": bench_magnus4_modulated_fast,
    "magnus6_modulated": bench_magnus6_modulated,
    "magnus4_modulated_4k": bench_magnus4_modulated_4k,
    "lindblad": bench_lindblad,
    "adjoint_grad": bench_adjoint_grad,
    "fit_loop": bench_fit_loop,
    "compensated": bench_compensated,
    "lz_sweep_efficiency": bench_lz_sweep_efficiency,
}


def _enable_compile_cache():
    """Same repo-local persistent compile cache bench.py uses: the tunnel's
    compile latency is erratic (106 s then 0.4 s for one program); warm
    loads make repeat benchmark sessions start in seconds."""
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass


def main():
    _enable_compile_cache()
    filters = sys.argv[1:]
    results = []
    printed = 0
    for name, fn in ALL.items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            fn(results)
        except Exception as e:  # noqa: BLE001
            results.append({"metric": name, "error": str(e)[:200]})
        # a bench fn may append SEVERAL rows (chained + paired steady-state)
        for row in results[printed:]:
            print(json.dumps(row), flush=True)
        printed = len(results)


if __name__ == "__main__":
    main()
