from .mesh import data_parallel_forward, make_mesh  # noqa: F401
