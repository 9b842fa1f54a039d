#!/usr/bin/env python
"""One-command real-weights ingest + validation (round-5 verdict item 8).

This environment has zero egress, so no pretrained checkpoint has ever
produced a real gradient here.  The moment an environment WITH weights
exists, this script validates the entire guidance surface in minutes:

    # Stable Diffusion (diffusers layout: unet/ + vae/ [+ text_encoder/])
    python scripts/ingest_weights.py --sd /path/to/stable-diffusion-2-1-base

    # Zero123 (single ldm ckpt, the reference's on-disk format:
    # reference guidance/temporal_zero123_guidance.py:42-74)
    python scripts/ingest_weights.py --zero123 /path/to/zero123-xl.ckpt \
        [--video /path/to/frames_dir]   # {idx:03}_rgba.png frames

    # No weights available: generate tiny GENUINE-layout checkpoints and
    # run the identical code path (what the dry test in
    # tests/test_ingest_weights.py does)
    python scripts/ingest_weights.py --dry-run

Each mode converts the checkpoint (convert.py), attaches the real denoiser
to the production guidance class, renders a small Gaussian scene with the
production rasterizer, runs --steps SDS steps end-to-end (render -> VAE
encode -> UNet CFG -> SDS backward into the Gaussian parameters), and
prints per-step loss + gradient norms.  Healthy output: finite losses,
nonzero means/scales/colors grad norms on every step.
"""

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def small_scene(n=2048, res=128, seed=0):
    import numpy as np
    import jax.numpy as jnp

    from threestudio_3dgs_tpu.ops import camera as cam_mod

    rng = np.random.default_rng(seed)
    params = dict(
        means=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3),
        raw_scales=jnp.asarray(
            rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 4.0
        ),
        quats=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        raw_opac=jnp.asarray(rng.normal(size=(n,)).astype(np.float32)),
        colors=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
    )
    eye = np.array([0.0, -2.2, 0.4])
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    cam = cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.9, 0.9, res, res)
    return params, cam


def run_sds_steps(guidance_call, params, cam, res, steps, lr=1e-2):
    """Shared driver: render -> guidance loss -> grads -> SGD step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize

    cfg = RasterizeConfig(
        tile_size=32,
        max_pairs=256 * 1024,
        impl="pallas" if jax.default_backend() == "tpu" else "jax",
    )

    def loss_fn(p, key):
        out = rasterize(
            p["means"],
            jnp.exp(p["raw_scales"]),
            p["quats"],
            jax.nn.sigmoid(p["raw_opac"]),
            cam,
            jnp.zeros(3),
            colors=p["colors"],
            config=cfg,
            with_depth=False,
        )
        rgb = out["image"][None]  # (1, H, W, 3)
        return guidance_call(rgb, key)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    key = jax.random.PRNGKey(0)
    ok = True
    for step in range(1, steps + 1):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        loss, grads = grad_fn(params, k)
        loss = float(np.asarray(loss))
        norms = {
            name: float(np.linalg.norm(np.asarray(g)))
            for name, g in grads.items()
        }
        dt = (time.perf_counter() - t0) * 1000
        print(
            f"  step {step:2d}  loss={loss:12.4f}  "
            + "  ".join(f"|g_{n}|={v:.3e}" for n, v in sorted(norms.items()))
            + f"  ({dt:.0f} ms)",
            flush=True,
        )
        if not np.isfinite(loss) or not all(
            np.isfinite(v) for v in norms.values()
        ):
            ok = False
        if norms["means"] == 0.0 and norms["colors"] == 0.0:
            ok = False
        params = {k2: v - lr * grads[k2] for k2, v in params.items()}
    return ok


def ingest_sd(path, steps, res):
    import jax
    import jax.numpy as jnp

    from threestudio_3dgs_tpu.guidance.stable_diffusion import (
        StableDiffusionGuidance,
    )

    print(f"[sd] loading diffusers checkpoint from {path} ...")
    guidance = StableDiffusionGuidance(pretrained_model_name_or_path=path)
    if guidance.denoiser is None:
        print("[sd] FAILED: no unet/diffusion_pytorch_model.* found")
        return False
    print(
        f"[sd] denoiser attached; VAE={'yes' if guidance.encode_rgb else 'no'}"
    )

    emb_dim = guidance._ctx_dim if hasattr(guidance, "_ctx_dim") else None

    class Prompt:
        def get_text_embeddings(self, *a, **k):
            d = emb_dim or 1024
            return jnp.ones((77, d)) * 0.02

    sched = guidance.sched_scalars(0)
    params, cam = small_scene(res=res)

    def call(rgb, key):
        out = guidance(rgb, Prompt(), {"elevation": None, "azimuth": None},
                       key=key, sched=sched)
        return out["loss_sds"]

    print(f"[sd] running {steps} SDS steps (render -> VAE -> UNet CFG -> bwd)")
    return run_sds_steps(call, params, cam, res, steps)


def ingest_zero123(ckpt, video_dir, steps, res, stable=True, cond_size=256):
    import numpy as np
    import jax.numpy as jnp

    from threestudio_3dgs_tpu.guidance.temporal_zero123 import (
        TemporalStableZero123Guidance,
        TemporalZero123Guidance,
    )

    cls = TemporalStableZero123Guidance if stable else TemporalZero123Guidance
    print(f"[zero123] loading {ckpt} ...")
    frames = load_video_frames(video_dir) if video_dir else synth_frames()
    guidance = cls(
        pretrained_model_name_or_path=ckpt,
        num_frames=frames.shape[0],
        cond_image_size=cond_size,
    )
    guidance.prepare_embeddings(frames)
    if guidance.denoiser is None:
        print("[zero123] FAILED: checkpoint did not yield a denoiser "
              "(not an ldm state dict / missing files)")
        return False
    print(f"[zero123] denoiser attached; {frames.shape[0]} frames conditioned")

    sched = guidance.sched_scalars(0)
    params, cam = small_scene(res=res)
    batch = {
        "elevation": jnp.zeros((1,)),
        "azimuth": jnp.full((1,), 30.0),
        "camera_distances": jnp.full((1,), 1.2),
        "frame_indices": jnp.zeros((1,), jnp.int32),
    }

    def call(rgb, key):
        out = guidance(rgb, None, batch, key=key, sched=sched)
        return out["loss_sds"]

    print(f"[zero123] running {steps} SDS steps")
    return run_sds_steps(call, params, cam, res, steps)


def synth_frames(t=4, hw=64):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.uniform(0.2, 0.8, size=(1, hw, hw, 3))
    drift = np.linspace(0, 0.15, t)[:, None, None, None]
    return np.clip(base + drift, 0, 1).astype(np.float32)


def load_video_frames(path):
    import glob

    import numpy as np
    from PIL import Image

    files = sorted(glob.glob(os.path.join(path, "*_rgba.png"))) or sorted(
        glob.glob(os.path.join(path, "*.png"))
    )
    frames = []
    for f in files:
        a = np.asarray(Image.open(f), np.float32) / 255.0
        if a.shape[-1] == 4:  # white-bg compositing, reference
            # data/temporal_image.py:200-202
            a = a[..., :3] * a[..., 3:] + (1.0 - a[..., 3:])
        frames.append(a)
    return np.stack(frames)


def make_dry_checkpoints(root):
    """Tiny GENUINE-layout checkpoints: diffusers dir for SD, single ldm
    ckpt for zero123 -- built from the format manifests the converter tests
    pin (tests/test_checkpoint_formats.py)."""
    import numpy as np
    import torch

    from tests.test_checkpoint_formats import (
        TINY_ZERO123,
        TestLDMFormat,
        TestLocalCheckpointEndToEnd,
        fill,
        diffusers_unet_manifest,
        ldm_vae_encoder_manifest,
    )

    sd_dir = TestLocalCheckpointEndToEnd().make_checkpoint_dir(
        os.path.join(root, "sd-tiny")
    )
    # zero123: ldm-named tiny UNet (8-ch input) + ldm VAE + cc_projection in
    # ONE ckpt file, the reference's on-disk format
    diff = fill(diffusers_unet_manifest(**TINY_ZERO123), seed=11)
    rename = TestLDMFormat.ldm_rename(diff.keys())
    ldm_sd = {
        "model.diffusion_model." + rename[k]: v for k, v in diff.items()
    }
    ldm_sd.update(fill(ldm_vae_encoder_manifest((16, 32), 2, 4), seed=12))
    rng = np.random.default_rng(13)
    ctx = TINY_ZERO123["cross_attention_dim"]
    ldm_sd["cc_projection.weight"] = rng.normal(
        size=(ctx, ctx + 4)
    ).astype(np.float32) * 0.05
    ldm_sd["cc_projection.bias"] = np.zeros(ctx, np.float32)
    ckpt = os.path.join(root, "zero123-tiny.ckpt")
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in ldm_sd.items()}},
        ckpt,
    )
    return sd_dir, ckpt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sd", help="diffusers checkpoint dir (unet/ + vae/)")
    ap.add_argument("--zero123", help="ldm ckpt file (zero123-xl / stable_zero123)")
    ap.add_argument("--video", help="frames dir for temporal conditioning")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--dry-run", action="store_true",
                    help="generate tiny genuine-layout checkpoints and ingest them")
    args = ap.parse_args()

    results = {}
    if args.dry_run:
        # tiny models: small render res + small conditioning res keep the
        # CPU attention sizes sane; the CODE PATH is identical to real ingest
        steps, res = min(args.steps, 3), min(args.res, 64)
        with tempfile.TemporaryDirectory() as root:
            sd_dir, ckpt = make_dry_checkpoints(root)
            results["sd"] = ingest_sd(sd_dir, steps, res)
            results["zero123"] = ingest_zero123(
                ckpt, None, steps, res, cond_size=32
            )
    else:
        if not args.sd and not args.zero123:
            print(__doc__)
            sys.exit(2)
        if args.sd:
            results["sd"] = ingest_sd(args.sd, args.steps, args.res)
        if args.zero123:
            results["zero123"] = ingest_zero123(
                args.zero123, args.video, args.steps, args.res
            )

    print("\n== ingest summary ==")
    ok = True
    for name, r in results.items():
        print(f"  {name}: {'OK (finite losses, nonzero grads)' if r else 'FAILED'}")
        ok = ok and r
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
