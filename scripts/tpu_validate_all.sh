#!/bin/bash
# One-shot hardware validation after the axon tunnel returns.
# Runs the full /verify recipe + perf measurements, logging everything to
# /tmp/tpu_validation_<ts>.log.  Each step under `timeout`, never pkill.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
TS=$(date +%Y%m%d-%H%M%S)
LOG=/tmp/tpu_validation_$TS.log
echo "log -> $LOG"
{
  echo "=== tunnel check ==="
  timeout 300 python -c "import jax; print(jax.devices())" || exit 1

  echo "=== bench.py (headline metric) ==="
  timeout 1700 python bench.py

  echo "=== training drive (30 steps, 256^2, fake guidance) ==="
  timeout 2300 python -u -m threestudio_3dgs_tpu.launch \
    --config threestudio_3dgs_tpu/configs/gaussian_splatting.yaml --train \
    trainer.max_steps=30 trainer.val_check_interval=30 \
    data.height=256 data.width=256 data.batch_size=2 \
    system.guidance_type=fake-sds-guidance exp_root_dir=/tmp/verify_run

  echo "=== batched-vs-loop profile (training scale) ==="
  timeout 580 python scripts/profile_batched.py --n 100000 --b 4 --res 256

  echo "=== pallas-vs-fallback parity probe ==="
  timeout 580 python scripts/check_bin_fused.py 2>/dev/null || \
    echo "(probe script optional)"

  echo "=== hardware dryrun: shard_map at scale + dp train step on chip ==="
  timeout 1800 python __graft_entry__.py hw

  echo "=== dp train step via the production trainer (1-device mesh) ==="
  timeout 1800 python scripts/profile_trainstep.py --res 256 --b 2 \
    --n 50000 --steps 5 --max-pairs $((512*1024)) --mesh 1

  echo "=== packed-vs-unpacked reduction gradients (1e-3 budget) ==="
  timeout 1700 python scripts/check_pack_grad.py

  echo "=== render-quality floor (Pallas vs oracle PSNR) ==="
  RUN_ON_TPU=1 timeout 1700 python -m pytest tests/test_quality_regression.py -x -q -s

  echo "=== all-packs error ledger (packed-vs-exact end to end) ==="
  RUN_ON_TPU=1 timeout 1700 python -m pytest tests/test_pack_ledger.py -x -q -s

  echo "=== kernel parity on hardware (compiled-mode atol 5e-4) ==="
  RUN_ON_TPU=1 timeout 1700 python -m pytest tests/test_blend_pallas.py -q
} 2>&1 | tee "$LOG"
echo "DONE -> $LOG"
