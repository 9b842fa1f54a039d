from . import gaussian_splatting, gaussian_zero123, gaussian_mvdream, gaussian_4dgen  # noqa: F401
