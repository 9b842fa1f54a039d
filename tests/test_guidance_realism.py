"""LoRA fusion, view-dependent prompting, and zero123 conditioning math."""

import numpy as np
import jax.numpy as jnp

from threestudio_3dgs_tpu.diffusion.convert import fuse_lora
from threestudio_3dgs_tpu.guidance.base import (
    PromptProcessorConfig,
    PromptUtils,
)
from threestudio_3dgs_tpu.guidance.temporal_zero123 import zero123_context


def test_fuse_lora_peft_naming():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 6)).astype(np.float32)
    down = rng.normal(size=(2, 6)).astype(np.float32)  # lora_A (r, in)
    up = rng.normal(size=(8, 2)).astype(np.float32)  # lora_B (out, r)
    base = {"mid_block.attn.to_q.weight": w}
    lora = {
        "mid_block.attn.to_q.lora_A.weight": down,
        "mid_block.attn.to_q.lora_B.weight": up,
    }
    fused = fuse_lora(base, lora, scale=0.5)
    want = w + 0.5 * (up @ down)  # alpha defaults to rank -> factor 1
    np.testing.assert_allclose(fused["mid_block.attn.to_q.weight"], want, rtol=1e-6)


def test_fuse_lora_alpha_and_prefix():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(4, 4)).astype(np.float32)
    down = rng.normal(size=(2, 4)).astype(np.float32)
    up = rng.normal(size=(4, 2)).astype(np.float32)
    base = {"down_blocks.0.to_v.weight": w}
    lora = {
        "unet.down_blocks.0.to_v.lora.down.weight": down,
        "unet.down_blocks.0.to_v.lora.up.weight": up,
        "unet.down_blocks.0.to_v.alpha": np.float32(4.0),
    }
    fused = fuse_lora(base, lora, scale=1.0)
    want = w + (4.0 / 2.0) * (up @ down)
    np.testing.assert_allclose(fused["down_blocks.0.to_v.weight"], want, rtol=1e-6)


def test_fuse_lora_conv_shapes():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(8, 4, 1, 1)).astype(np.float32)  # 1x1 conv proj
    down = rng.normal(size=(2, 4, 1, 1)).astype(np.float32)
    up = rng.normal(size=(8, 2, 1, 1)).astype(np.float32)
    base = {"m.proj_in.weight": w}
    lora = {
        "m.proj_in.lora_down.weight": down,
        "m.proj_in.lora_up.weight": up,
    }
    fused = fuse_lora(base, lora)
    want = w + (
        up.reshape(8, 2) @ down.reshape(2, 4)
    ).reshape(w.shape)
    np.testing.assert_allclose(fused["m.proj_in.weight"], want, rtol=1e-6)


def test_view_dependent_prompt_selection():
    cfg = PromptProcessorConfig(
        prompt="a dog", front_threshold=30.0, back_threshold=30.0,
        overhead_threshold=60.0,
    )
    pu = PromptUtils("a dog", cfg=cfg)
    elev = jnp.array([0.0, 0.0, 0.0, 70.0, 0.0])
    azim = jnp.array([5.0, 90.0, 175.0, 10.0, -170.0])
    idx = np.asarray(pu.view_index(elev, azim))
    # front, side, back, overhead, back (azimuth wraps)
    np.testing.assert_array_equal(idx, [0, 1, 2, 3, 2])

    embs = pu.get_text_embeddings(elev, azim)
    assert embs.shape == (5,) + pu.text_embedding.shape
    # distinct prompts hash to distinct embeddings
    assert float(jnp.abs(embs[0] - embs[1]).max()) > 0.0
    # no-arg call returns the base prompt embedding
    assert pu.get_text_embeddings().shape == pu.text_embedding.shape


def test_view_dependent_disabled():
    cfg = PromptProcessorConfig(prompt="x", view_dependent_prompting=False)
    pu = PromptUtils("x", cfg=cfg)
    out = pu.get_text_embeddings(jnp.zeros(3), jnp.zeros(3))
    assert out.shape == pu.text_embedding.shape  # falls back to shared


def test_zero123_context_shapes_and_math():
    rng = np.random.default_rng(3)
    clip = jnp.asarray(rng.normal(size=(4, 768)).astype(np.float32))
    cam = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(772, 768)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(768,)).astype(np.float32))
    ctx = zero123_context(clip, cam, w, b)
    assert ctx.shape == (4, 1, 768)
    want = np.concatenate([clip, cam], axis=-1) @ np.asarray(w) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(ctx[:, 0]), want, rtol=2e-5, atol=2e-4)
