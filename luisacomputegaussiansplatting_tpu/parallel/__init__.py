from .mesh import initialize_multihost, make_mesh
from .render_sharded import ShardedRenderConfig, render_sharded
from .train_sharded import make_sharded_train_step

__all__ = [
    "initialize_multihost",
    "make_mesh",
    "render_sharded",
    "ShardedRenderConfig",
    "make_sharded_train_step",
]
