from .mesh import make_mesh
from .render_sharded import render_sharded, ShardedRenderConfig

__all__ = ["make_mesh", "render_sharded", "ShardedRenderConfig"]
