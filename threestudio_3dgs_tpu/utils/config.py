"""Config system: YAML experiment files with ``${...}`` interpolation, custom
resolvers, CLI dotlist overrides, dataclass parsing, and scheduled
hyperparameters via :func:`C`.

Re-implements (from scratch, without OmegaConf) the config surface the
reference relies on:
  * scheduled hyperparameters ``C(value, epoch, step)`` accepting either a
    scalar or ``[start_step, start_value, end_value, end_step]``
    (reference geometry/gaussian_base.py:478,545-572 via threestudio.utils.misc.C)
  * interpolation ``${a.b.c}`` and resolvers ``${rmspace:...}``,
    ``${basename:...}``, ``${gt0:...}``, ``${not:...}``, ``${cmaxgt0:...}``,
    ``${cmaxgt0orcmaxgt0:...}`` (reference configs/gaussian_splatting.yaml:2,
    configs/gs4d_spline.yaml:18,126)
  * per-component ``@dataclass Config`` parsing (reference data/uncond.py:656
    via parse_structured)
  * CLI dotlist overrides ``key.subkey=value`` (reference README.md:41)
"""

from __future__ import annotations

import copy
import dataclasses
import math
import os
import re
from dataclasses import fields, is_dataclass
from typing import Any, Dict, List, Optional, Union

import yaml

# ---------------------------------------------------------------------------
# Scheduled hyperparameters
# ---------------------------------------------------------------------------


def C(value: Any, epoch: int, global_step: int, interpolation: str = "linear") -> float:
    """Evaluate a possibly-scheduled config value at (epoch, global_step).

    A scalar passes through.  A list ``[start_value, end_value, end_step]`` or
    ``[start_step, start_value, end_value, end_step]`` interpolates between
    ``start_value`` and ``end_value`` as the step (int end_step) or epoch
    (float end_step) moves from ``start_step`` to ``end_step``.

    interpolation:
      * ``linear``   -- lerp
      * ``exp``      -- geometric (log-space lerp); used for LR decay
                        (reference geometry/gaussian_base.py:545-572)
      * ``interval`` -- start_value while step is inside [start_step, end_step),
                        end_value outside (reference system/sugar_static.py:260)
    """
    if isinstance(value, (int, float)):
        return value
    if isinstance(value, (list, tuple)):
        value = list(value)
        if len(value) == 3:
            value = [0] + value
        if len(value) > 4:
            # multi-segment schedule [t0, v0, v1, t1, v2, t2, ...]: piecewise
            # linear through knots (t0,v0),(t1,v1),(t2,v2)... (the reference's
            # color_clip uses this form, configs/gaussian_splatting_mvdream
            # .yaml:49: [0, 0.01, 0.02, 1500, 0.5, 4000, 1.0, 7000])
            if len(value) % 2 != 0:
                raise ValueError(f"multi-segment schedule needs even length, got {value}")
            knots = [(value[0], value[1])]
            for i in range(2, len(value), 2):
                knots.append((value[i + 1], value[i]))
            current = epoch if isinstance(knots[-1][0], float) else global_step
            if current <= knots[0][0]:
                return float(knots[0][1])
            for (t0, v0), (t1, v1) in zip(knots[:-1], knots[1:]):
                if current < t1:
                    if interpolation == "interval":
                        return float(v0)  # step function over the knots
                    tt = (current - t0) / max(t1 - t0, 1e-8)
                    if interpolation == "exp":
                        return math.exp(
                            math.log(max(v0, 1e-30)) * (1 - tt)
                            + math.log(max(v1, 1e-30)) * tt
                        )
                    return v0 + (v1 - v0) * tt
            return float(knots[-1][1])
        if len(value) != 4:
            raise ValueError(f"scheduled value must have 3 or 4 entries, got {value}")
        start_step, start_value, end_value, end_step = value
        current = epoch if isinstance(end_step, float) else global_step
        if interpolation == "interval":
            return start_value if start_step <= current < end_step else end_value
        denom = max(end_step - start_step, 1e-8)
        t = min(1.0, max(0.0, (current - start_step) / denom))
        if interpolation == "linear":
            return start_value + (end_value - start_value) * t
        if interpolation == "exp":
            return math.exp(
                math.log(max(start_value, 1e-30)) * (1 - t)
                + math.log(max(end_value, 1e-30)) * t
            )
        raise ValueError(f"unknown interpolation {interpolation!r}")
    raise TypeError(f"cannot schedule value of type {type(value)}: {value!r}")


def C_max(value: Any) -> float:
    """Max value a schedule can reach (used by the ``cmaxgt0`` resolver)."""
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, (list, tuple)):
        v = list(value)
        if len(v) == 3:
            v = [0] + v
        if len(v) > 4:  # multi-segment [t0, v0, v1, t1, v2, t2, ...]
            return float(max([v[1]] + v[2::2]))
        _, start_value, end_value, _ = v
        return float(max(start_value, end_value))
    raise TypeError(f"cannot take C_max of {value!r}")


# ---------------------------------------------------------------------------
# Interpolation + resolvers
# ---------------------------------------------------------------------------

_RESOLVERS = {
    "rmspace": lambda s, replace: s.replace(" ", replace),
    "basename": lambda p: os.path.basename(str(p)),
    "gt0": lambda x: _as_number(x) > 0,
    "not": lambda x: not _as_bool(x),
    "cmaxgt0": lambda x: C_max(_maybe_yaml(x)) > 0,
    "cmaxgt0orcmaxgt0": lambda a, b: (C_max(_maybe_yaml(a)) > 0)
    or (C_max(_maybe_yaml(b)) > 0),
    "idiv": lambda a, b: int(_as_number(a) // _as_number(b)),
    "mul": lambda a, b: _as_number(a) * _as_number(b),
    "add": lambda a, b: _as_number(a) + _as_number(b),
}


def _as_number(x: Any) -> float:
    if isinstance(x, bool):
        return float(x)
    if isinstance(x, (int, float)):
        return x
    return float(yaml.safe_load(str(x)))


def _as_bool(x: Any) -> bool:
    if isinstance(x, bool):
        return x
    if isinstance(x, str):
        return yaml.safe_load(x) in (True, 1)
    return bool(x)


def _maybe_yaml(x: Any) -> Any:
    if isinstance(x, str):
        try:
            return yaml.safe_load(x)
        except yaml.YAMLError:
            return x
    return x


_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


def _lookup(root: Any, dotted: str) -> Any:
    node = root
    for part in dotted.split("."):
        if isinstance(node, dict):
            node = node[part]
        elif isinstance(node, (list, tuple)):
            node = node[int(part)]
        else:
            node = getattr(node, part)
    return node


def _split_args(body: str) -> List[str]:
    """Split resolver args on commas not inside nested ${...} or [...]."""
    args, depth, cur = [], 0, []
    for ch in body:
        if ch in "{[(":
            depth += 1
        elif ch in "}])":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    args.append("".join(cur))
    return args


def _resolve_str(s: str, root: Any) -> Any:
    """Resolve all ${...} in a string; innermost-first, up to a fixed depth."""
    for _ in range(20):
        m = _INTERP_RE.search(s)
        if m is None:
            return _maybe_yaml(s) if s != m else s
        body = m.group(1)
        if ":" in body and body.split(":", 1)[0] in _RESOLVERS:
            name, argstr = body.split(":", 1)
            args = [a.strip() for a in _split_args(argstr)]
            val = _RESOLVERS[name](*args)
        else:
            val = _lookup(root, body.strip())
        if m.span() == (0, len(s)):
            # whole-string interpolation keeps the value's type
            if isinstance(val, str) and _INTERP_RE.search(val):
                s = val
                continue
            return val
        s = s[: m.start()] + str(val) + s[m.end() :]
    raise RecursionError(f"interpolation did not converge: {s!r}")


def resolve(node: Any, root: Any = None) -> Any:
    """Recursively resolve interpolations in a yaml-loaded structure."""
    if root is None:
        root = node
        # iterate until fixpoint so forward references resolve
        for _ in range(10):
            new = _resolve_once(node, root)
            if new == node:
                return new
            node = new
            root = node
        return node
    return _resolve_once(node, root)


def _resolve_once(node: Any, root: Any) -> Any:
    if isinstance(node, dict):
        return {k: _resolve_once(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_once(v, root) for v in node]
    if isinstance(node, str) and "${" in node:
        try:
            return _resolve_str(node, root)
        except (KeyError, IndexError, AttributeError):
            return node  # unresolved yet; later fixpoint pass may succeed
    return node


# ---------------------------------------------------------------------------
# Dotlist overrides
# ---------------------------------------------------------------------------


def apply_dotlist(cfg: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply CLI overrides of the form ``a.b.c=value`` (value parsed as YAML)."""
    cfg = copy.deepcopy(cfg)
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must look like key=value, got {item!r}")
        key, raw = item.split("=", 1)
        value = yaml.safe_load(raw) if raw != "" else None
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = {}
            node = node[p]
        node[parts[-1]] = value
    return cfg


# ---------------------------------------------------------------------------
# Dataclass parsing
# ---------------------------------------------------------------------------


def parse_structured(cls: type, cfg: Optional[Dict[str, Any]] = None) -> Any:
    """Build a dataclass instance from a dict, recursing into dataclass fields.

    Unknown keys are kept in an ``extra`` attribute rather than erroring, so
    configs written for the reference still load.
    """
    cfg = dict(cfg or {})
    if not is_dataclass(cls):
        raise TypeError(f"{cls} is not a dataclass")
    kwargs: Dict[str, Any] = {}
    known = {f.name: f for f in fields(cls)}
    extra: Dict[str, Any] = {}
    for key, value in cfg.items():
        if key in known:
            ftype = known[key].type
            if is_dataclass(ftype) and isinstance(value, dict):
                value = parse_structured(ftype, value)
            kwargs[key] = value
        else:
            extra[key] = value
    obj = cls(**kwargs)
    object.__setattr__(obj, "extra", extra)
    return obj


def config_to_primitive(cfg: Any) -> Any:
    if is_dataclass(cfg) and not isinstance(cfg, type):
        return {f.name: config_to_primitive(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, dict):
        return {k: config_to_primitive(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [config_to_primitive(v) for v in cfg]
    return cfg


# ---------------------------------------------------------------------------
# Experiment config loading
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ExperimentConfig:
    name: str = "default"
    tag: str = ""
    description: str = ""
    seed: int = 0
    exp_root_dir: str = "outputs"
    use_timestamp: bool = True
    timestamp: Optional[str] = None

    data_type: str = ""
    data: Dict[str, Any] = dataclasses.field(default_factory=dict)
    system_type: str = ""
    system: Dict[str, Any] = dataclasses.field(default_factory=dict)
    trainer: Dict[str, Any] = dataclasses.field(default_factory=dict)
    checkpoint: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # reference configs carry a `loggers: wandb: {enable, project, name}`
    # block (reference configs/gaussian_splatting.yaml:71-75)
    loggers: Dict[str, Any] = dataclasses.field(default_factory=dict)
    resume: Optional[str] = None

    trial_name: str = ""
    trial_dir: str = ""

    def set_dirs(self) -> None:
        import datetime

        if self.use_timestamp and self.timestamp is None:
            self.timestamp = datetime.datetime.now().strftime("@%Y%m%d-%H%M%S")
        tag = self.tag or "run"
        self.trial_name = tag + (self.timestamp or "")
        self.trial_dir = os.path.join(self.exp_root_dir, self.name, self.trial_name)


def load_config(path: str, overrides: Optional[List[str]] = None) -> ExperimentConfig:
    with open(path) as f:
        raw = yaml.safe_load(f)
    raw = apply_dotlist(raw, overrides or [])
    raw = resolve(raw)
    cfg = parse_structured(ExperimentConfig, raw)
    cfg.set_dirs()
    return cfg


def dump_config(cfg: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config_to_primitive(cfg), f, sort_keys=False)
