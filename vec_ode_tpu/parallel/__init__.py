"""Ensemble parallelism: vmap batching + shard_map over device meshes."""

from .ensemble import (
    ensemble_mesh,
    ensemble_solve,
    ensemble_solve_compact,
    shard_batch,
    step_efficiency,
)
from .state_parallel import (
    ensemble_solve_state_sharded,
    local_rows,
    mesh_2d,
    solve_linear_state_sharded,
)

__all__ = [
    "ensemble_solve",
    "ensemble_solve_compact",
    "ensemble_mesh",
    "shard_batch",
    "step_efficiency",
    "local_rows",
    "solve_linear_state_sharded",
    "ensemble_solve_state_sharded",
    "mesh_2d",
]
