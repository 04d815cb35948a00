#!/usr/bin/env python
"""Evaluate a checkpoint on the KITTI val split (tools/test.py equivalent).

Standalone distributed eval (the reference's tools/dist_test.py:1-110 twin):
launch this script once per host with --coordinator/--num-processes/
--process-id — each host runs inference on its val-split shard, the
fixed-shape detection buffers are all-gathered, and host 0 merges + computes
AP (Trainer._validate_multihost)."""
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
    parser.add_argument("--eval_ids", type=int, nargs="+", default=None,
                        help="hand-picked KITTI image ids: per-sample debug "
                             "evaluation (test_v2, tools/test.py:55-118); "
                             "writes KITTI label txts to --save_dir")
    parser.add_argument("--save_dir", default="sample_eval_results")
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 for multi-host eval "
                             "(tools/dist_test.py twin)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.coordinator is not None:
        # same bootstrap as tools/train.py (the jax equivalent of the
        # reference's init_dist + torch.distributed.launch in dist_test.py)
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            initialization_timeout=600,
            shutdown_timeout_seconds=3600)

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

    if args.eval_ids is not None:
        if trainer.num_hosts > 1:
            raise SystemExit("--eval_ids is a single-host debug mode")
        from sessd_tpu.data.kitti_common import annos_to_kitti_label

        ds = trainer.val_dataset
        id_to_index = {int(info["image"]["image_idx"]): i
                       for i, info in enumerate(ds.infos)}
        unknown = [i for i in args.eval_ids if i not in id_to_index]
        if unknown:
            raise SystemExit(
                f"--eval_ids not in the val split: {unknown} "
                f"(split has {len(id_to_index)} samples)")
        indices = [id_to_index[i] for i in args.eval_ids]
        dets = trainer.predict_samples(indices, use_ema=args.use_ema)
        annos = ds.convert_detection_to_kitti_annos(dets, indices=indices)
        os.makedirs(args.save_dir, exist_ok=True)
        for image_id, anno in zip(args.eval_ids, annos):
            path = os.path.join(args.save_dir, f"{image_id:06d}.txt")
            with open(path, "w") as f:
                f.write("\n".join(annos_to_kitti_label(anno)) + "\n")
            trainer.logger.info(
                f"sample {image_id}: {len(anno['name'])} detections -> {path}")
        return

    results = trainer.validate(use_ema=args.use_ema)
    if args.out and results is not None:  # host 0 only (peers get None)
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump(results, f)
        trainer.logger.info(f"wrote {args.out}")


if __name__ == "__main__":
    main()
