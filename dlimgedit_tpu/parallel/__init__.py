from .mesh import make_mesh, sam_param_sharding, batch_sharding

__all__ = ["make_mesh", "sam_param_sharding", "batch_sharding"]
