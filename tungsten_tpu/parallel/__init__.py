from .mesh import make_render_mesh, shard_render_pass  # noqa: F401
