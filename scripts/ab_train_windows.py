"""A/B the full-scale training step: old vs lifted LARGE Pallas windows.

The unaugmented teacher chains reach subm1 spans ~2160 > the old
window_large 2048, tripping BOTH stage-1 subm convs of the teacher forward
to the whole-conv gather fallback every step (found by
serve.fallback_telemetry on the training chains). The large windows bound
only the patch kernel (a handful of blocks per conv), so lifting them
trades a sliver of patch GEMM width for removing the ~7x fallback.

Run alone on the TPU (one process owns the chip).
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

    b = 4
    batch = add_host_rulebooks(make_full_batch(b=b), b)
    opt = build_optimizer(OneCycleConfig(total_steps=1000))

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = create_train_state(
            VoxelNet(sparse_shape=(41, 1600, 1408), conv_impl="gather"),
            opt, jax.tree_util.tree_map(np.asarray, batch), batch_size=b)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    bd = jax.device_put(batch, dev)

    def timeit(fn, *args, iters=8):
        out = fn(*args)
        np.asarray(out).ravel()[:1]
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(out).ravel()[:1]
            d = (time.perf_counter() - t0) / iters
            best = d if best is None else min(best, d)
        return best * 1e3

    configs = {
        "old-large": dict(subm_windows=(896, 2048, 1280, 768),
                          down_windows=(1024, 2048, 1792, 768)),
        "new-large (defaults)": {},
    }
    for name, kw in configs.items():
        model = VoxelNet(sparse_shape=(41, 1600, 1408), dtype=jnp.bfloat16,
                         backbone_remat=False, dense_from_stage=3, **kw)
        step = jax.jit(make_train_step(model, opt, LossConfig(),
                                       compute_teacher_metrics=False))
        ms = timeit(lambda s: step(s, bd, jnp.float32(0.5))[1]["loss"], state)
        print(f"full step dfs=3 {name}: {ms:.1f} ms "
              f"({b / ms * 1e3:.2f} scenes/s/chip)", flush=True)


if __name__ == "__main__":
    main()
