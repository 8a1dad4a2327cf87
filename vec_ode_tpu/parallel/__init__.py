"""Ensemble parallelism: vmap batching + shard_map over device meshes."""

from .ensemble import ensemble_mesh, ensemble_solve, shard_batch
from .state_parallel import (
    ensemble_solve_state_sharded,
    mesh_2d,
    solve_linear_state_sharded,
)

__all__ = [
    "ensemble_solve",
    "ensemble_mesh",
    "shard_batch",
    "solve_linear_state_sharded",
    "ensemble_solve_state_sharded",
    "mesh_2d",
]
