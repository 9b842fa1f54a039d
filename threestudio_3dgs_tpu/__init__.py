"""threestudio_3dgs_tpu: a TPU-native differentiable Gaussian-splatting generation
framework (JAX / XLA / Pallas), built from scratch with the capabilities of the
`threestudio-3dgs` reference extension (see /root/repo/SURVEY.md).

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):
  ops/        -- L0: math core + Pallas rasterizer kernels (replaces CUDA
                 diff-gaussian-rasterization + simple-knn)
  models/     -- L2: Gaussian fields (static-capacity, masked densify/prune),
                 spacetime/4D variants, SuGaR, PLY I/O, mesh extraction
  renderers/  -- L3: rasterizer frontends (basic/advanced/background/normal/
                 shading/spacetime/sugar), vmapped batch rendering
  materials/  -- L4: shading materials
  backgrounds/-- L4: learned backgrounds
  guidance/   -- L5: score-distillation guidance (deterministic fake + SDS math)
  data/       -- L6: camera/image/video samplers
  systems/    -- L7: training orchestration (functional train steps)
  parallel/   -- device-mesh sharding (camera/tile axes, psum gradient reduction)
  utils/      -- config system (YAML + scheduled hyperparams), registry, saving
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: first compile of the full train step
# through the TPU tunnel takes minutes; cache serialized executables on disk
# so every later process (launch/bench/scripts/tests) skips it.
import os as _os

if not _os.environ.get("THREESTUDIO_3DGS_TPU_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/jax_compilation"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs: compile uncached
        pass

from .utils.registry import register, find, registry  # noqa: F401

# importing subpackages triggers component registration (the reference plugin
# does the same in its __init__.py:14-44)
from . import ops  # noqa: F401
from . import models  # noqa: F401
from .models import exporter  # noqa: F401
from . import materials  # noqa: F401
from . import backgrounds  # noqa: F401
from . import renderers  # noqa: F401
from . import guidance  # noqa: F401
from . import data  # noqa: F401
from . import systems  # noqa: F401
