from anuraxla.parallel.mesh import batch_sharding, make_mesh, replicated  # noqa: F401
