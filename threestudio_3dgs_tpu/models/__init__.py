from . import ply_io, optim, gaussian_field, deformation, spacetime, mesh_extract  # noqa: F401
