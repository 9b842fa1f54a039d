"""Dry test for the one-command weights ingest (scripts/ingest_weights.py):
generated GENUINE-layout checkpoints (diffusers dir + single ldm ckpt) flow
through the identical convert -> attach -> render -> SDS path a real-weights
environment would use, producing finite losses and nonzero gradients."""

import importlib.util
import os
import sys
import tempfile


def _load_script():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "ingest_weights.py",
    )
    spec = importlib.util.spec_from_file_location("ingest_weights", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dry_ingest_sd_and_zero123():
    mod = _load_script()
    with tempfile.TemporaryDirectory() as root:
        sd_dir, ckpt = mod.make_dry_checkpoints(root)
        assert os.path.isfile(
            os.path.join(sd_dir, "unet", "diffusion_pytorch_model.safetensors")
        )
        assert mod.ingest_sd(sd_dir, steps=1, res=64)
        assert mod.ingest_zero123(ckpt, None, steps=1, res=64, cond_size=32)
