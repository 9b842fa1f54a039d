"""CLI entry point, mirroring the reference usage
(`python launch.py --config configs/x.yaml --train --gpu 0 key=value ...`,
reference README.md:41).  The --gpu flag is accepted for compatibility and
ignored (device selection is JAX's)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="threestudio_3dgs_tpu launcher")
    parser.add_argument("--config", required=True)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--validate", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--export", action="store_true")
    parser.add_argument("--predict", action="store_true")
    parser.add_argument("--gpu", default=None, help="ignored (compat)")
    parser.add_argument("--resume", default=None)
    parser.add_argument(
        "--profile", action="store_true",
        help="capture a jax.profiler device trace of the first training steps",
    )
    parser.add_argument("overrides", nargs="*", help="dotlist key=value overrides")
    args = parser.parse_args(argv)

    from .utils.config import load_config
    from .trainer import Trainer

    cfg = load_config(args.config, args.overrides)
    if args.resume:
        cfg.resume = args.resume
    trainer = Trainer(cfg)

    if args.train:
        if args.profile:
            from .utils.profiling import device_trace
            import os as _os

            with device_trace(_os.path.join(cfg.trial_dir, "profile")):
                trainer.fit(resume=cfg.resume)
        else:
            trainer.fit(resume=cfg.resume)
        trainer.test()
    elif args.validate:
        # validation-only: load the checkpoint (or a fresh init) -- the
        # reference's --validate never trains (threestudio launch.py)
        if cfg.resume:
            from .utils.ckpt import load_checkpoint

            trainer.state, trainer.step = load_checkpoint(cfg.resume)
        else:
            trainer.state = trainer.system.init_state(cfg.seed)
        trainer.validate()
    elif args.test:
        if cfg.resume:
            from .utils.ckpt import load_checkpoint

            trainer.state, trainer.step = load_checkpoint(cfg.resume)
        else:
            trainer.state = trainer.system.init_state(cfg.seed)
        trainer.test()
    if args.predict:
        if trainer.state is None:
            if cfg.resume:
                from .utils.ckpt import load_checkpoint

                trainer.state, trainer.step = load_checkpoint(cfg.resume)
            else:
                trainer.state = trainer.system.init_state(cfg.seed)
        trainer.predict()
    if args.export:
        if trainer.state is None:
            if cfg.resume:
                from .utils.ckpt import load_checkpoint

                trainer.state, trainer.step = load_checkpoint(cfg.resume)
            else:
                trainer.state = trainer.system.init_state(cfg.seed)
        trainer.export()


if __name__ == "__main__":
    main()
