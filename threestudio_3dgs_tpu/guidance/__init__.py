from . import base, fake, sds, stable_diffusion, temporal_zero123  # noqa: F401
