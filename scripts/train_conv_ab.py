"""A/B the sparse-conv implementation inside the TRAINING step.

Training currently runs the XLA gather formulation for the sparse stages
(conv_impl="auto" resolves to gather when train=True); the Pallas windowed
one-hot kernel (ops/pallas/wconv._core) has a custom VJP, so it can run the
training forward+backward too (conv_impl="pallas"). In serving the kernel
beats the gather ~2x at the 16/32ch stages — this measures whether that
carries to the dfs=3 bf16+hostrb training step. Run alone on the TPU.
"""
import os
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

    # B=1 by default: at B=4 the _core bwd kernel's resident dfeat
    # ([32, 88k] f32 = 11 MB) exceeds VMEM and spans stack past the
    # single-level windows — establish the kernel-vs-gather ratio at B=1
    # (everything fits, windows measured non-fallback on b1 scenes) before
    # investing in a streaming/two-level bwd.
    b = int(os.environ.get("AB_BATCH", "1"))
    opt = build_optimizer(OneCycleConfig(total_steps=1000))
    dev = jax.devices()[0]
    cpu = jax.local_devices(backend="cpu")[0]

    batch = make_full_batch(b=b)
    bd = jax.device_put(add_host_rulebooks(batch, b), dev)
    tiny = (41, 32, 32)
    init_batch = {
        "voxels": batch["voxels"][:, :64],
        "coords": np.minimum(batch["coords"][:, :64], np.int32(tiny) - 1),
        "num_points": batch["num_points"][:, :64],
        "voxel_mask": batch["voxel_mask"][:, :64],
    }
    with jax.default_device(cpu):
        state0 = create_train_state(
            VoxelNet(sparse_shape=tiny, conv_impl="gather",
                     stage_capacity=(128,) * 5),
            opt, init_batch, batch_size=b)
    state0 = jax.device_put(
        jax.tree_util.tree_map(np.asarray, state0), dev)

    for impl in ("gather", "pallas"):
        model = VoxelNet(sparse_shape=(41, 1600, 1408), dtype=jnp.bfloat16,
                         backbone_remat=False, dense_from_stage=3,
                         conv_impl=impl)
        step = jax.jit(make_train_step(model, opt, LossConfig(),
                                       compute_teacher_metrics=False))
        try:
            t0 = time.perf_counter()
            state, metrics = step(state0, bd, jnp.float32(0.5))
            l0 = float(metrics["loss"])
            compile_s = time.perf_counter() - t0
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    state, metrics = step(state, bd, jnp.float32(0.5))
                lf = float(metrics["loss"])
                d = (time.perf_counter() - t0) / 5
                best = d if best is None else min(best, d)
            print(f"{impl:8s}: {best * 1e3:8.1f} ms/step  "
                  f"(compile {compile_s:.0f}s, loss {l0:.3f}->{lf:.3f})",
                  flush=True)
        except Exception as e:
            print(f"{impl:8s}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
