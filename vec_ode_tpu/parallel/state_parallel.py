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


def local_rows(assemble: Callable, mesh: Mesh,
               axis: Optional[str] = None) -> Callable:
    """Turn a GLOBAL operator assembly ``assemble(t) -> (D, D)`` into the
    per-shard ``assemble_local(t) -> (D/n, D)`` the state-sharded solvers
    consume: each device assembles the full operator and keeps its row
    block (convenient; for large D write assemble_local directly so each
    device only builds its rows)."""
    axis = axis or mesh.axis_names[-1]
    n = mesh.shape[axis]

    def assemble_local(t):
        A = assemble(t)
        rows = A.shape[0] // n
        i = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(A, i * rows, rows, axis=0)

    return assemble_local


def solve_linear_state_sharded(
    A,
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
    """Integrate dx/dt = A(t) x with the operator row-sharded over
    ``mesh[axis]``.

    ``A`` is either a constant (D, D) array (passed as a full host/global
    array; shard_map in_specs shard it), or a TIME-DEPENDENT callable
    ``assemble_local(t) -> (D_local, D)`` evaluated per shard INSIDE
    shard_map — use ``jax.lax.axis_index(axis)`` for the row-block index,
    or wrap a global assembly with :func:`local_rows`. This covers driven
    Hamiltonians and other A(t): the exponential steppers' whole domain.
    ``y0`` is the full (D,) state. Returns a Solution whose state outputs
    are sharded over ``axis`` and whose scalars are replicated.
    """
    if stepper is None:
        stepper = RungeKutta()
    # default to the LAST mesh axis, matching local_rows — on a multi-axis
    # mesh the two defaulting to different axes would silently mismatch
    # row blocks against state shards
    axis = axis or mesh.axis_names[-1]
    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    if h0 is None:
        h0 = ctl.init_h()
    a_fn = A if callable(A) else None

    def make_run(with_a_arg):
        def run(*args):
            if with_a_arg:
                A_local, y_local = args
            else:
                (y_local,) = args

            def rhs(t, y_loc):
                y_full = jax.lax.all_gather(y_loc, axis, axis=0, tiled=True)
                a_loc = a_fn(t) if a_fn is not None else A_local
                return jnp.einsum(
                    "ij,j->i", a_loc, y_full, precision=HIGHEST
                )

            def err_norm(e):
                sq = jnp.sum(jnp.real(e * jnp.conj(e)))
                return jnp.sqrt(jax.lax.psum(sq, axis))

            step_fn = stepper.make_step_fn(rhs)
            init_carry_fn = (
                stepper.make_init_carry(rhs)
                if getattr(stepper, "has_carry", False) else None
            )
            return integrate(
                step_fn, y_local, t_grid, h0,
                adaptive=adaptive, ctl=ctl, error_norm=err_norm,
                pack_carry=getattr(stepper, "prefers_packed_carry", False),
                init_carry_fn=init_carry_fn,
            )

        return run

    if a_fn is None:
        mapped = jax.shard_map(
            make_run(True), mesh=mesh,
            in_specs=(P(axis, None), P(axis)),
            out_specs=_solution_specs(axis), check_vma=False,
        )
        return mapped(A, y0)
    mapped = jax.shard_map(
        make_run(False), mesh=mesh,
        in_specs=(P(axis),),
        out_specs=_solution_specs(axis), check_vma=False,
    )
    return mapped(y0)


def ensemble_solve_state_sharded(
    A,
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
    per RHS eval + psum per step, riding ICI). ``A`` is a constant (D, D)
    array (row-sharded over ``state_axis``, replicated over ``traj_axis``)
    or a time-dependent ``assemble_local(t) -> (D_local, D)`` callable (see
    :func:`solve_linear_state_sharded` / :func:`local_rows`).
    """
    if stepper is None:
        stepper = RungeKutta()
    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    if h0 is None:
        h0 = ctl.init_h()
    a_fn = A if callable(A) else None

    def make_run(with_a_arg):
        def run(*args):  # A: (D/s, D); y: (B/t, D/s)
            if with_a_arg:
                A_local, y_local = args
            else:
                (y_local,) = args

            def rhs(t, y_loc):
                y_full = jax.lax.all_gather(y_loc, state_axis, axis=0,
                                            tiled=True)
                a_loc = a_fn(t) if a_fn is not None else A_local
                return jnp.einsum(
                    "ij,j->i", a_loc, y_full, precision=HIGHEST
                )

            def err_norm(e):
                sq = jnp.sum(jnp.real(e * jnp.conj(e)))
                return jnp.sqrt(jax.lax.psum(sq, state_axis))

            step_fn = stepper.make_step_fn(rhs)
            init_carry_fn = (
                stepper.make_init_carry(rhs)
                if getattr(stepper, "has_carry", False) else None
            )

            def single(y0):
                return integrate(
                    step_fn, y0, t_grid, h0,
                    adaptive=adaptive, ctl=ctl, error_norm=err_norm,
                    pack_carry=getattr(stepper, "prefers_packed_carry",
                                       False),
                    init_carry_fn=init_carry_fn,
                )

            return jax.vmap(single)(y_local)

        return run

    if a_fn is None:
        mapped = jax.shard_map(
            make_run(True), mesh=mesh,
            in_specs=(P(state_axis, None), P(traj_axis, state_axis)),
            out_specs=_solution_specs(state_axis, traj_axis),
            check_vma=False,
        )
        return mapped(A, y0_batch)
    mapped = jax.shard_map(
        make_run(False), mesh=mesh,
        in_specs=(P(traj_axis, state_axis),),
        out_specs=_solution_specs(state_axis, traj_axis),
        check_vma=False,
    )
    return mapped(y0_batch)


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
