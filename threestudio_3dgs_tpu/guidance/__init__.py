from . import (  # noqa: F401
    base,
    fake,
    mvdream,
    sds,
    stable_diffusion,
    temporal_zero123,
)
