from .api import RasterizeConfig, rasterize, rasterize_batched  # noqa: F401
