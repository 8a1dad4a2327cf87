"""Headline benchmark: aggregate adaptive RKF45 throughput on a
16k-trajectory x 64-dim complex ensemble at rtol=1e-8 (BASELINE.md north
star; the reference publishes no numbers of its own).

Runs on whatever jax.devices() provides (one real TPU chip under the driver;
a v5e-8 mesh would shard the same program over 8 chips via
vec_ode_tpu.parallel). Complex states are real-pair (Cplx) because the axon
TPU backend implements no complex dtypes; the RHS is one fused
(B, 128) @ (128, 128) real matmul per stage evaluation — exact MXU tiling.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import vec_ode_tpu as vo
from vec_ode_tpu.models import DrivenDense
from vec_ode_tpu.ops import cplx as cp
from vec_ode_tpu.parallel import ensemble_mesh, ensemble_solve, shard_batch

N_TRAJ = 16384
DIM = 64
RTOL = 1e-8
TF = 1.0
NORTH_STAR = 1.0e6  # aggregate adaptive RKF45 steps/sec (BASELINE.json)


def main():
    n_dev = len(jax.devices())
    model = DrivenDense.make(d=DIM, seed=0)

    rng = np.random.default_rng(42)
    psi0 = rng.standard_normal((N_TRAJ, DIM)) + 1j * rng.standard_normal(
        (N_TRAJ, DIM)
    )
    psi0 /= np.linalg.norm(psi0, axis=-1, keepdims=True)
    y0 = cp.from_complex(psi0, jnp.float32)

    ctl = vo.StepControl(rtol=RTOL, min_dt=1e-6, max_dt=0.25)
    mesh = ensemble_mesh() if n_dev > 1 else None
    if mesh is not None:
        y0 = shard_batch(y0, mesh)

    # Pallas-fused RK step: the entire 6-stage step + error norm in one
    # kernel per trajectory tile (ops/pallas_rk.py)
    from vec_ode_tpu.ops.pallas_rk import FusedModulatedLinearRK

    stepper = FusedModulatedLinearRK.from_driven_dense(model, jnp.float32)

    REPS = 16  # chained full solves per call: amortizes the ~100ms fixed
               # dispatch latency of the experimental device tunnel

    def solve_once(y0, t0, tf):
        sol = ensemble_solve(
            None, y0, t0, tf,
            stepper=stepper,
            ctl=ctl, h0=1e-3, adaptive=True,
            time_dtype=jnp.float32, mesh=mesh,
        )
        return sol

    @jax.jit
    def run(y0, t0, tf):
        def body(carry, _):
            y, acc, rej, it = carry
            sol = solve_once(y, t0, tf)
            # renormalize and chain: next rep integrates from the final state
            n = jnp.sqrt(
                jnp.sum(sol.y_final.re**2 + sol.y_final.im**2,
                        axis=-1, keepdims=True)
            )
            y_next = cp.Cplx(sol.y_final.re / n, sol.y_final.im / n)
            return (
                (y_next, acc + sol.n_accept, rej + sol.n_reject,
                 it + sol.n_iters),
                None,
            )

        zeros = jnp.zeros((jax.tree_util.tree_leaves(y0)[0].shape[0],),
                          jnp.int32)
        (yf, acc, rej, it), _ = jax.lax.scan(
            body, (y0, zeros, zeros, zeros), None, length=REPS
        )
        return acc, rej, it, yf

    def run_sync(t0, tf):
        # materialize on host: the experimental axon tunnel's
        # block_until_ready can return before execution completes, so force
        # full device->host transfers as the timing barrier
        na, nr, ni, yf = run(y0, t0, tf)
        return (
            np.asarray(na), np.asarray(nr), np.asarray(ni),
            float(np.asarray(yf.re[0, 0])),
        )

    # warmup/compile with identical shapes (tf is traced, so no recompile)
    run_sync(0.0, 0.02)

    reps = 3
    t_start = time.perf_counter()
    for _ in range(reps):
        na, nr, ni, _ = run_sync(0.0, TF)
    wall = (time.perf_counter() - t_start) / reps

    total_steps = int(np.sum(na))
    total_rejects = int(np.sum(nr))
    steps_per_sec = total_steps / wall

    result = {
        "metric": (
            f"aggregate adaptive RKF45 steps/sec, {N_TRAJ}x{DIM}-dim complex"
            f" ensemble, rtol={RTOL:g}, {n_dev} device(s)"
        ),
        "value": round(steps_per_sec, 1),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / NORTH_STAR, 4),
        "detail": {
            "wall_s": round(wall, 3),
            "accepted_steps": total_steps,
            "rejected_steps": total_rejects,
            "rhs_evals_per_sec": round(6 * (total_steps + total_rejects) / wall, 1),
            "mean_steps_per_traj": round(total_steps / N_TRAJ, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # the experimental device tunnel occasionally fails transiently
    # (FAILED_PRECONDITION / HTTP compile errors); retry before giving up
    import time as _time

    last = None
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            last = e
            _time.sleep(5.0 * (attempt + 1))
    else:
        raise last
