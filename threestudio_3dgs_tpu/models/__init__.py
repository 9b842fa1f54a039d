from . import ply_io, optim, gaussian_field  # noqa: F401
