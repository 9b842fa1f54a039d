from . import gaussian_splatting, gaussian_zero123, gaussian_mvdream, gaussian_4dgen, sugar_static, sugar_4dgen  # noqa: F401
