"""Ensemble parallelism: vmap batching + shard_map over device meshes."""

from .ensemble import ensemble_mesh, ensemble_solve, shard_batch

__all__ = ["ensemble_solve", "ensemble_mesh", "shard_batch"]
