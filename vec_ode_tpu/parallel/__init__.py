"""Ensemble parallelism: vmap batching + shard_map over device meshes."""

from .ensemble import (
    ensemble_mesh,
    ensemble_solve,
    cost_sorted_permutation,
    ensemble_solve_compact,
    inverse_permutation,
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
    "cost_sorted_permutation",
    "inverse_permutation",
    "ensemble_mesh",
    "shard_batch",
    "step_efficiency",
    "local_rows",
    "solve_linear_state_sharded",
    "ensemble_solve_state_sharded",
    "mesh_2d",
]
