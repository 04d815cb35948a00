#!/usr/bin/env python
"""Train SE-SSD (tools/train.py equivalent).

Usage: python tools/train.py CONFIG [--work_dir D] [--resume_from D]
       [--seed N] [--no-dist]

Distribution model: unlike the reference's per-GPU torch.distributed.launch
processes (tools/train.py:68-75), this is a single process driving a
jax.sharding Mesh over all local devices; multi-host runs launch the same
script once per host (jax.distributed handles rendezvous).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser(description="Train a detector")
    parser.add_argument("config", help="config file path")
    parser.add_argument("--work_dir", default=None)
    parser.add_argument("--resume_from", default=None)
    parser.add_argument("--load_from", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-dist", action="store_true",
                        help="single-device (no mesh)")
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 for multi-host runs")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    import os

    import jax

    # persistent compile cache: repeat runs (and the peer hosts of a
    # multi-host job) skip the minutes-long model compile
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.coordinator is not None:
        # multi-host bootstrap (the jax equivalent of init_dist,
        # det3d/torchie/apis/env.py:13-51); under SLURM/GKE plain
        # jax.distributed.initialize() with no args also works
        # long shutdown timeout: host 0 runs the (compile-heavy) eval after
        # training while the other hosts are already waiting to exit
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            initialization_timeout=600,
            shutdown_timeout_seconds=3600)

    from sessd_tpu.config import Config
    from sessd_tpu.train.trainer import Trainer

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.work_dir

    trainer = Trainer(cfg, work_dir=work_dir, seed=args.seed,
                      distributed=not args.no_dist)
    load_from = args.load_from or cfg.get("load_from")
    if load_from:
        trainer.load_from(load_from)
    if args.resume_from or cfg.get("resume_from"):
        trainer.resume()
    results = trainer.run()
    if results is not None and trainer.host_id == 0:
        import json

        def _plain(o):
            if isinstance(o, dict):
                return {k: _plain(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                return [_plain(v) for v in o]
            if hasattr(o, "tolist"):
                return o.tolist()
            return o

        path = os.path.join(work_dir, "eval_results.json")
        with open(path, "w") as f:
            json.dump(_plain(results), f, indent=1)
        trainer.logger.info(f"wrote {path}")


if __name__ == "__main__":
    main()
