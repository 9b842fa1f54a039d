from . import ply_io, optim, gaussian_field, deformation, spacetime, mesh_extract, sugar, dynamic_sugar, gaussian_dynamic, texture_bake  # noqa: F401
