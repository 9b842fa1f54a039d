from .api import RasterizeConfig, rasterize  # noqa: F401
