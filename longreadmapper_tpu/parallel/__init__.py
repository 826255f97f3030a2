from .mesh import make_mesh, data_sharded, replicated
from .dist import make_sharded_map_step, shard_index

__all__ = ["make_mesh", "data_sharded", "replicated",
           "make_sharded_map_step", "shard_index"]
