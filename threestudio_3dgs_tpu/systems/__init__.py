from . import gaussian_splatting, gaussian_zero123, gaussian_mvdream  # noqa: F401
