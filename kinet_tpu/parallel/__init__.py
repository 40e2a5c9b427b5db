from .mesh import make_mesh, shard_pytree, replicate  # noqa: F401
