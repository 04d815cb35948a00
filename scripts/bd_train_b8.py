"""Batch-size ladder for the dfs=3 bf16+hostrb training step on the TPU.

dense_from_stage=3 keeps stage 2 sparse, freeing the dense-stage
activations that made batch 4 the f32 memory ceiling — larger per-chip
batches amortize fixed per-step cost if they fit. Run alone on the TPU.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from train_ab import add_host_rulebooks, make_full_batch  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sessd_tpu.models import VoxelNet
    from sessd_tpu.train.losses import LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import create_train_state, make_train_step

    opt = build_optimizer(OneCycleConfig(total_steps=1000))
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]

    for b in (4, 6, 8):
        batch = make_full_batch(b=b)
        bd = jax.device_put(add_host_rulebooks(batch, b), dev)
        # tiny-grid CPU init (param shapes are grid/cap independent;
        # full-grid CPU init traces for ~10 min — trainer.py:92-104)
        tiny = (41, 32, 32)
        init_batch = {
            "voxels": batch["voxels"][:, :64],
            "coords": np.minimum(batch["coords"][:, :64], np.int32(tiny) - 1),
            "num_points": batch["num_points"][:, :64],
            "voxel_mask": batch["voxel_mask"][:, :64],
        }
        with jax.default_device(cpu):
            state = create_train_state(
                VoxelNet(sparse_shape=tiny, conv_impl="gather",
                         stage_capacity=(128,) * 5),
                opt, init_batch, batch_size=b)
        state = jax.device_put(
            jax.tree_util.tree_map(np.asarray, state), dev)
        model = VoxelNet(sparse_shape=(41, 1600, 1408), dtype=jnp.bfloat16,
                         backbone_remat=False, dense_from_stage=3)
        step = jax.jit(make_train_step(model, opt, LossConfig(),
                                       compute_teacher_metrics=False))

        def run(s):
            return step(s, bd, jnp.float32(0.5))[1]["loss"]

        try:
            out = run(state)
            float(np.asarray(out))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    out = run(state)
                float(np.asarray(out))
                d = (time.perf_counter() - t0) / 8
                best = d if best is None else min(best, d)
            print(f"B={b}: {best * 1e3:.1f} ms = "
                  f"{b / best:.2f} scenes/s/chip", flush=True)
        except Exception as e:
            print(f"B={b}: FAILED {str(e)[:200]}", flush=True)
        del state, bd


if __name__ == "__main__":
    main()
