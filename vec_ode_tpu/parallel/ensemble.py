"""Ensemble propagation: many independent trajectories, batched and sharded.

The reference is a single-trajectory, single-thread integrator; its only
scaling axis is running many independent trajectories externally (SURVEY.md
§5 "long-context/sequence parallelism" entry). Here that becomes a
first-class execution model:

  * ``ensemble_solve`` — ``vmap`` of the full while_loop driver: each
    trajectory carries its own (t, h, save-cursor, status); the batched loop
    body is masked per-trajectory and runs until all trajectories in the
    shard finish (SURVEY §7 hard-part #1).
  * with a ``jax.sharding.Mesh``, the batch axis is sharded over devices via
    ``shard_map``. Trajectories are embarrassingly parallel, so the mapped
    body contains NO collectives — each device runs its own while_loop and
    finishes independently (no cross-device straggler sync until the final
    gather of results).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import lc
from ..controller import StepControl
from ..driver import Solution, integrate, make_grid
from ..rk import RungeKutta

Pytree = Any


def ensemble_solve(
    rhs_or_op: Callable,
    y0_batch: Pytree,
    t0,
    tf,
    *,
    stepper=None,
    h0: Optional[float] = None,
    adaptive: bool = True,
    ctl: StepControl = StepControl(),
    save_at=None,
    error_norm: Callable = lc.norm_l2,
    time_dtype=None,
    mesh: Optional[Mesh] = None,
    axis_name: str = "traj",
    method: str = "while",
    params: Optional[Pytree] = None,
) -> Solution:
    """Integrate a batch of independent trajectories (leading axis of every
    leaf of ``y0_batch``).

    ``rhs_or_op`` is the per-trajectory RHS ``f(t, y)`` (RK steppers) or
    operator assembly ``op_fn(t)`` (exp steppers) — unbatched; the ensemble
    dimension comes from ``vmap``. With ``mesh``, the batch axis must divide
    the mesh size and is sharded across devices (ICI) via ``shard_map``.

    ``params``: optional pytree with the same leading batch axis, mapped
    alongside the state — the signature becomes ``f(t, y, p)`` /
    ``op_fn(t, p)``, so ensembles can sweep model parameters (e.g. one
    Landau-Zener rate per trajectory), not just initial conditions.
    Unsupported for natively-batched steppers (they embed their own RHS).

    ``h0`` may be a (B,)-shaped array for per-trajectory warm starts (e.g.
    the ``h_final`` of a previous chained solve).
    """
    if stepper is None:
        stepper = RungeKutta()
    if time_dtype is None:
        time_dtype = jnp.result_type(jnp.asarray(t0), jnp.asarray(tf), float)
    t_grid = make_grid(t0, tf, save_at, dtype=time_dtype)
    if h0 is None:
        h0 = ctl.init_h()
    if params is None:
        step_fn = stepper.make_step_fn(rhs_or_op)
    else:
        if getattr(stepper, "is_batched", False):
            raise ValueError(
                "params is unsupported for natively-batched steppers"
            )
        step_fn = None  # built per-trajectory below

    h_batched = hasattr(h0, "ndim") and jnp.ndim(h0) == 1

    if getattr(stepper, "is_batched", False):
        # natively-batched stepper (e.g. the Pallas fused RK step): one
        # driver loop over the whole (local) batch, no vmap
        stepper_norm = getattr(stepper, "error_norm", None)
        if stepper_norm is not None and error_norm is not lc.norm_l2:
            raise ValueError(
                "this stepper computes its own per-trajectory error norms; "
                "a custom error_norm cannot be applied"
            )
        enorm = stepper_norm or lc.norm_l2_batched

        fused_solve = getattr(stepper, "fused_loop_solve", None)

        def batched(y0, p, h):
            import dataclasses as dc

            del p  # params unsupported for natively-batched steppers
            b = jax.tree_util.tree_leaves(y0)[0].shape[0]
            sol = None
            if fused_solve is not None and method == "while":
                # whole-loop on-chip path (ops/pallas_loop.py); None when
                # the config is not kernel-eligible
                sol = fused_solve(y0, t_grid, h, ctl=ctl, adaptive=adaptive)
            if sol is not None:
                return sol
            sol = integrate(
                step_fn, y0, t_grid, h,
                adaptive=adaptive, ctl=ctl,
                error_norm=enorm, method=method,
                batch_shape=(b,),
                pack_carry=getattr(stepper, "prefers_packed_carry", False),
            )
            # match the vmap path's output batching (uniform out_specs under
            # shard_map): broadcast the shared save grid per trajectory
            return dc.replace(
                sol, ts=jnp.broadcast_to(sol.ts, (b,) + sol.ts.shape)
            )
    else:
        def single(y0, p, h):
            if params is None:
                fn = step_fn
            else:
                import inspect

                takes_state = getattr(stepper, "takes_state", False)
                want = 3 if takes_state else 2
                try:
                    n_args = len(inspect.signature(rhs_or_op).parameters)
                except (TypeError, ValueError):
                    n_args = want
                if n_args != want:
                    sig = "(t, y, p)" if takes_state else "(t, p)"
                    raise ValueError(
                        f"with params, this stepper expects rhs_or_op{sig}; "
                        f"got a {n_args}-parameter callable"
                    )
                if takes_state:       # f(t, y, p) — RK steppers
                    fn = stepper.make_step_fn(
                        lambda t, y: rhs_or_op(t, y, p)
                    )
                else:                 # op_fn(t, p) — exp steppers
                    fn = stepper.make_step_fn(lambda t: rhs_or_op(t, p))
            return integrate(
                fn, y0, t_grid, h,
                adaptive=adaptive, ctl=ctl,
                error_norm=error_norm, method=method,
                pack_carry=getattr(stepper, "prefers_packed_carry", False),
                init_carry_fn=(
                    stepper.make_init_carry(
                        rhs_or_op if params is None
                        else (lambda t, y: rhs_or_op(t, y, p))
                    )
                    if getattr(stepper, "has_carry", False) else None
                ),
            )

        in_axes = (0, 0 if params is not None else None,
                   0 if h_batched else None)
        batched = jax.vmap(single, in_axes=in_axes)

    # uniform (y0, params, h0) argument layout for both paths so h0 warm
    # starts shard correctly through shard_map
    args = (y0_batch, params, h0)
    if mesh is not None:
        ax = mesh.axis_names[0]
        in_specs = (
            P(ax),
            P(ax) if params is not None else P(),
            P(ax) if h_batched else P(),
        )

    if mesh is None:
        return batched(*args)

    n_shards = mesh.devices.size
    lead = jax.tree_util.tree_leaves(y0_batch)[0].shape[0]
    if lead % n_shards != 0:
        raise ValueError(
            f"ensemble size {lead} must divide the mesh size {n_shards}"
        )
    mesh_axis = mesh.axis_names[0]
    sharded = jax.shard_map(
        batched,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(mesh_axis),
        check_vma=False,
    )
    return sharded(*args)


def ensemble_mesh(n_devices: Optional[int] = None, axis: str = "traj") -> Mesh:
    """1-D device mesh over all (or the first n) local devices — the ICI
    layout for trajectory sharding."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))


def shard_batch(y0_batch: Pytree, mesh: Mesh) -> Pytree:
    """Place a host batch with its leading axis sharded over the mesh, so the
    subsequent ensemble_solve runs without a gather."""
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), y0_batch
    )