"""Component registry.

Replaces the host-framework registry the reference plugs into
(`threestudio.register(...)` / `threestudio.find(...)`, used at e.g. reference
geometry/gaussian_base.py:187 and system/gaussian_splatting.py:30).  Components
register under the same string names so reference YAML configs map 1:1.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

registry: Dict[str, Any] = {}


def register(name: str) -> Callable[[Any], Any]:
    """Class decorator: ``@register("gaussian-splatting")``."""

    def decorator(cls: Any) -> Any:
        if name in registry and registry[name] is not cls:
            raise ValueError(f"duplicate registry name: {name!r}")
        registry[name] = cls
        cls.registry_name = name
        return cls

    return decorator


def find(name: str) -> Any:
    """Look up a registered component class by name."""
    if name not in registry:
        import difflib

        close = difflib.get_close_matches(name, registry.keys(), n=3)
        hint = f" (did you mean {close}?)" if close else ""
        raise KeyError(f"no component registered under {name!r}{hint}")
    return registry[name]
