from .mesh import make_mesh, shard_module_params, batch_sharding, replicate

__all__ = ["make_mesh", "shard_module_params", "batch_sharding", "replicate"]
