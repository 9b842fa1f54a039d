from . import uncond, image, temporal_image  # noqa: F401
