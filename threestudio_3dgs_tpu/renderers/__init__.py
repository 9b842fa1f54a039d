from . import gaussian  # noqa: F401
