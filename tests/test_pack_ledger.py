"""All-packs error ledger (round-5 verdict item 6) + production-default
assertions (round-4 weak #6).

Every lossy pack was verified in isolation (pack21 grads round 3, 24-bit
forward payloads round 4), but the packs share ONE end-to-end error budget
against the all-exact path.  This ledger runs the full production
configuration (all packs at their defaults) against the same pipeline with
every pack disabled, on hardware, and asserts the combined budget -- the
gate any NEW pack proposal must pay against.

On CPU (default suite) the end-to-end comparison is skipped: the XLA
fallback path does not route through the packed kernels, so packed-vs-exact
would compare identical programs.  `scripts/tpu_validate_all.sh` runs this
file under RUN_ON_TPU=1 on every hardware sweep.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize
from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod
from threestudio_3dgs_tpu.ops.rasterizer import blend_pallas as blend_mod
from tests.test_quality_regression import fixed_scene, psnr, TILE

RUN_ON_TPU = bool(os.environ.get("RUN_ON_TPU"))

# Combined budgets for ALL packs together vs the all-exact path.  The
# round-5 probe data (PERF.md "means2d packing rejection"): production
# pipeline sits at 95.5 dB vs oracle; packed-vs-exact must keep enough
# margin that the 85 dB oracle floor retains >= ~3x rms headroom.
LEDGER_PSNR_FLOOR = 92.0
LEDGER_GRAD_REL = 1e-3  # L2-relative, per parameter leaf


def _no_env_overrides():
    names = [
        "THREESTUDIO_TPU_PACK_FEATS",
        "THREESTUDIO_TPU_PACK_GRAD_BITS",
        "THREESTUDIO_TPU_BLEND_FWD_WIDTH",
        "THREESTUDIO_TPU_BLEND_BWD_WIDTH",
    ]
    return [n for n in names if n in os.environ]


def test_production_defaults_are_the_fast_path():
    """The A/B env knobs exist for measurement; a mis-set knob in the bench
    environment would silently bench the slow path (round-4 weak #6).  When
    no override is present, the module constants must equal the measured
    production configuration that BENCH records."""
    overrides = _no_env_overrides()
    if overrides:
        pytest.skip(f"env overrides present: {overrides}")
    assert bin_mod.PACK_FEATS is True
    assert bin_mod.PACK_GRAD_BITS == 21
    assert blend_mod.FWD_WIDTH == 256
    assert blend_mod.BWD_WIDTH == 256


@pytest.mark.skipif(
    not RUN_ON_TPU, reason="packed kernels only run on hardware"
)
def test_all_packs_ledger_vs_exact():
    if _no_env_overrides():
        pytest.skip("env overrides active; ledger needs production defaults")
    means, scales, quats, opacities, colors, cam = fixed_scene()
    cfg = RasterizeConfig(tile_size=TILE, max_pairs=1 << 19, impl="pallas")
    # fixed random projection makes the gradient comparison scalar-loss-based
    # but sensitive to every image pixel
    w = jax.random.normal(jax.random.PRNGKey(7), (256, 256, 3))

    def run():
        def loss(ms, sc, qt, op, co):
            out = rasterize(
                ms, sc, qt, op, cam, jnp.zeros(3), colors=co, config=cfg
            )
            return jnp.sum(out["image"] * w), out["image"]

        (l, img), grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4),
                                             has_aux=True)(
            means, scales, quats, opacities, colors
        )
        return np.asarray(img), [np.asarray(g) for g in grads]

    img_p, grads_p = run()  # production: all packs at defaults

    saved = (bin_mod.PACK_FEATS, bin_mod.PACK_GRAD_BITS)
    try:
        bin_mod.PACK_FEATS = False
        bin_mod.PACK_GRAD_BITS = 0
        jax.clear_caches()  # flags are trace-time constants
        img_e, grads_e = run()
    finally:
        bin_mod.PACK_FEATS, bin_mod.PACK_GRAD_BITS = saved
        jax.clear_caches()

    p = psnr(img_p, img_e)
    rels = []
    for gp, ge in zip(grads_p, grads_e):
        denom = np.linalg.norm(ge.astype(np.float64)) + 1e-30
        rels.append(np.linalg.norm((gp - ge).astype(np.float64)) / denom)
    print(
        f"[ledger] packed-vs-exact PSNR={p:.2f} dB  "
        f"grad relL2={['%.2e' % r for r in rels]}"
    )
    assert p >= LEDGER_PSNR_FLOOR, p
    assert max(rels) <= LEDGER_GRAD_REL, rels
