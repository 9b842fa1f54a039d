from . import base, fake, sds, stable_diffusion  # noqa: F401
