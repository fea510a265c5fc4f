from .mesh import ensemble_mesh, shard_ensemble

__all__ = ["ensemble_mesh", "shard_ensemble"]
