#!/usr/bin/env python
"""Evaluate a checkpoint on the KITTI val split (tools/test.py equivalent)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser(description="Test a detector")
    parser.add_argument("config")
    parser.add_argument("--work_dir", default=None)
    parser.add_argument("--checkpoint_epoch", type=int, default=None)
    parser.add_argument("--use_ema", action="store_true",
                        help="evaluate the EMA teacher instead of the student")
    parser.add_argument("--out", default=None, help="pkl path for dt annos")
    args = parser.parse_args()

    from sessd_tpu.config import Config
    from sessd_tpu.train.trainer import Trainer
    from sessd_tpu.utils import checkpoint as ckpt

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.work_dir
    trainer = Trainer(cfg, work_dir=work_dir, distributed=False)
    state, epoch = ckpt.load_checkpoint(work_dir, trainer.state,
                                        args.checkpoint_epoch)
    if state is None:
        raise SystemExit(f"no checkpoint found under {work_dir}")
    trainer.state = state
    trainer.logger.info(f"evaluating epoch {epoch} (ema={args.use_ema})")
    results = trainer.validate(use_ema=args.use_ema)
    if args.out and results is not None:
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump(results, f)


if __name__ == "__main__":
    main()
