"""State-dimension parallelism: shard one large linear ODE over the mesh.

The reference's only scaling axes are per-trajectory state size and external
trajectory counts (SURVEY §5). Trajectory (data) parallelism is
``ensemble.py``; this module adds the second axis the hardware offers:
**state sharding** for dx/dt = A x with D too large for one chip —

  * A is row-sharded over the mesh axis: each device holds (D/n, D);
  * the state is sharded (D/n,) per device;
  * one RHS evaluation = ``all_gather`` the state over ICI + a local
    (D/n, D) @ (D,) contraction — the classic 1-D row-parallel matvec;
  * the controller needs one scalar per step: the error norm is a local
    sum + ``psum`` over the mesh axis, so every device takes identical
    accept/reject decisions and the loop stays in lockstep with exactly two
    collectives per stage evaluation (gather) + one per step (psum).

Composes with trajectory parallelism on a 2-D mesh ("traj", "state"):
each trajectory row-block is replicated along "traj" and each trajectory
batch is sharded along "traj" (see :func:`ensemble_solve_state_sharded`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..controller import StepControl
from ..driver import Solution, integrate, make_grid
from ..rk import RungeKutta
from ..utils.prec import HIGHEST

Pytree = Any


def _solution_specs(axis: Optional[str], traj_axis: Optional[str] = None):
    """out_specs pytree for a Solution whose state leaves are sharded over
    ``axis`` (last state dim) and optionally ``traj_axis`` (leading batch)."""
    if traj_axis is None:
        state_spec = P(axis)               # y_final: (D,)
        ys_spec = P(None, axis)            # ys: (n_grid, D)
        scalar = P()
        ts_spec = P()
    else:
        state_spec = P(traj_axis, axis)    # y_final: (B, D)
        ys_spec = P(traj_axis, None, axis)  # ys: (B, n_grid, D)
        scalar = P(traj_axis)
        ts_spec = P(traj_axis, None)       # vmap broadcasts ts to (B, n_grid)
    return Solution(
        ts=ts_spec,
        ys=ys_spec,
        t_final=scalar,
        y_final=state_spec,
        status=scalar,
        n_accept=scalar,
        n_reject=scalar,
        n_iters=scalar,
        h_final=scalar,
        n_rhs_evals=None,
    )


def solve_linear_state_sharded(
    A: jax.Array,
    y0: jax.Array,
    t0,
    tf,
    *,
    mesh: Mesh,
    axis: Optional[str] = None,
    stepper=None,
    h0: Optional[float] = None,
    adaptive: bool = True,
    ctl: StepControl = StepControl(),
    save_at=None,
    time_dtype=None,
) -> Solution:
    """Integrate dx/dt = A x with A (D, D) row-sharded over ``mesh[axis]``.

    ``A`` and ``y0`` are passed as full (host/global) arrays; sharding is
    applied by shard_map in_specs. Returns a Solution whose state outputs are
    sharded over ``axis`` and whose scalars are replicated.
    """
    if stepper is None:
        stepper = RungeKutta()
    axis = axis or mesh.axis_names[0]
    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    if h0 is None:
        h0 = ctl.init_h()

    def run(A_local, y_local):
        def rhs(t, y_loc):
            y_full = jax.lax.all_gather(y_loc, axis, axis=0, tiled=True)
            return jnp.einsum(
                "ij,j->i", A_local, y_full, precision=HIGHEST
            )

        def err_norm(e):
            sq = jnp.sum(jnp.real(e * jnp.conj(e)))
            return jnp.sqrt(jax.lax.psum(sq, axis))

        step_fn = stepper.make_step_fn(rhs)
        return integrate(
            step_fn, y_local, t_grid, h0,
            adaptive=adaptive, ctl=ctl, error_norm=err_norm,
        )

    mapped = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=_solution_specs(axis),
        check_vma=False,
    )
    return mapped(A, y0)


def ensemble_solve_state_sharded(
    A: jax.Array,
    y0_batch: jax.Array,
    t0,
    tf,
    *,
    mesh: Mesh,
    traj_axis: str = "traj",
    state_axis: str = "state",
    stepper=None,
    h0: Optional[float] = None,
    adaptive: bool = True,
    ctl: StepControl = StepControl(),
    save_at=None,
    time_dtype=None,
) -> Solution:
    """2-D parallelism: a (B, D) ensemble on a ("traj", "state") mesh.

    The trajectory batch is sharded over ``traj_axis`` (no communication);
    each trajectory's D-dim state is sharded over ``state_axis`` (all_gather
    per RHS eval + psum per step, riding ICI). A is row-sharded over
    ``state_axis`` and replicated over ``traj_axis``.
    """
    if stepper is None:
        stepper = RungeKutta()
    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    if h0 is None:
        h0 = ctl.init_h()

    def run(A_local, y_local):  # A: (D/s, D); y: (B/t, D/s)
        def rhs(t, y_loc):
            y_full = jax.lax.all_gather(y_loc, state_axis, axis=0, tiled=True)
            return jnp.einsum(
                "ij,j->i", A_local, y_full, precision=HIGHEST
            )

        def err_norm(e):
            sq = jnp.sum(jnp.real(e * jnp.conj(e)))
            return jnp.sqrt(jax.lax.psum(sq, state_axis))

        step_fn = stepper.make_step_fn(rhs)

        def single(y0):
            return integrate(
                step_fn, y0, t_grid, h0,
                adaptive=adaptive, ctl=ctl, error_norm=err_norm,
            )

        return jax.vmap(single)(y_local)

    mapped = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(state_axis, None), P(traj_axis, state_axis)),
        out_specs=_solution_specs(state_axis, traj_axis),
        check_vma=False,
    )
    return mapped(A, y0_batch)


def mesh_2d(n_traj_shards: int, n_state_shards: int,
            traj_axis: str = "traj", state_axis: str = "state") -> Mesh:
    """Build a 2-D device mesh for combined trajectory x state sharding."""
    import numpy as np

    devs = jax.devices()
    n = n_traj_shards * n_state_shards
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(n_traj_shards, n_state_shards)
    return Mesh(grid, (traj_axis, state_axis))
