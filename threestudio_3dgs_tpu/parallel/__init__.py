from . import mesh, data_parallel  # noqa: F401
