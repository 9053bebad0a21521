from .mesh import make_spp_mesh, shard_spp, render_super_sharded

__all__ = ["make_spp_mesh", "shard_spp", "render_super_sharded"]
