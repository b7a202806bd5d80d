from .mesh import (
    make_mesh,
    multihost_init,
    replicated,
    sharded_pixels,
    shard_map_render,
    spp_parallel_render,
)

__all__ = [
    "make_mesh",
    "multihost_init",
    "replicated",
    "sharded_pixels",
    "shard_map_render",
    "spp_parallel_render",
]
