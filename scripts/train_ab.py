"""A/B the full-scale training step on the TPU: f32+remat vs bf16+remat vs
bf16 without remat (bf16 halves activation HBM; r1 needed remat to fit f32
batch-4 in 16G). Prints step ms per config. Run alone on the TPU."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_full_batch(b=4, v=20000, a=70400):
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.utils.native import get_native
    from sessd_tpu.utils.synth_scene import make_scene

    native = get_native()
    spec = KITTI_VOXELIZER
    rng = np.random.RandomState(0)

    def vox(seed):
        pts = np.asarray(make_scene(seed=seed)[0])
        voxels, coords, npts = native.voxelize(
            pts, spec.point_cloud_range, spec.voxel_size, spec.max_points, v)
        n = coords.shape[0]
        out_v = np.zeros((v, spec.max_points, 4), np.float32)
        out_c = np.zeros((v, 3), np.int32)
        out_n = np.zeros((v,), np.int32)
        out_v[:n], out_c[:n], out_n[:n] = voxels, coords, npts
        mask = np.zeros((v,), bool)
        mask[:n] = True
        return out_v, out_c, out_n, mask

    def stack(seeds):
        vs, cs, ns, ms = zip(*[vox(s) for s in seeds])
        return (np.stack(vs), np.stack(cs), np.stack(ns), np.stack(ms))

    voxels, coords, num_points, mask = stack(range(b))
    voxels_r, coords_r, num_points_r, mask_r = stack(range(100, 100 + b))
    anchors = create_anchors_3d_range(
        [1, 200, 176], [0, -40.0, -1.0, 70.4, 40.0, -1.0]).reshape(-1, 7)
    assert anchors.shape[0] == a
    batch = dict(
        voxels=voxels, coords=coords, num_points=num_points, voxel_mask=mask,
        voxels_raw=voxels_r, coords_raw=coords_r,
        num_points_raw=num_points_r, voxel_mask_raw=mask_r,
        anchors=np.broadcast_to(anchors, (b, a, 7)).astype(np.float32).copy(),
        labels=rng.choice([-1, 0, 1], size=(b, a), p=[0.05, 0.9, 0.05]).astype(np.int32),
        reg_targets=(rng.randn(b, a, 7) * 0.05).astype(np.float32),
        labels_raw=rng.choice([-1, 0, 1], size=(b, a), p=[0.05, 0.9, 0.05]).astype(np.int32),
        reg_targets_raw=(rng.randn(b, a, 7) * 0.05).astype(np.float32),
        transformation=dict(
            flipped=rng.rand(b) > 0.5,
            noise_rotation=rng.uniform(-0.7, 0.7, b).astype(np.float32),
            noise_scale=rng.uniform(0.95, 1.05, b).astype(np.float32),
        ),
    )
    return batch


def add_host_rulebooks(batch, b, sparse_shape=(41, 1600, 1408),
                       caps=(20000, 22000, 18000, 12000, 8000)):
    """Attach loader-built (C++) student+teacher rulebook chains — the
    production training topology (kills all device-side sorts/LUT lookups)."""
    from sessd_tpu.serve import DOWNS
    from sessd_tpu.train.train_step import _coords_with_batch
    from sessd_tpu.utils.native import get_native

    native = get_native()
    total_caps = [c * b for c in caps]

    def rb(suffix):
        coords = np.asarray(_coords_with_batch(batch["coords" + suffix]))
        valid = np.asarray(batch["voxel_mask" + suffix]).reshape(-1)
        return native.build_rulebooks(coords, valid, (b,) + sparse_shape,
                                      total_caps, DOWNS)

    return dict(batch, rulebooks=rb(""), rulebooks_raw=rb("_raw"))


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
    batch = make_full_batch(b=b)
    batch_dev = jax.device_put(batch, jax.devices()[0])
    opt = build_optimizer(OneCycleConfig(total_steps=1000))

    import os
    variants = [
        ("f32+remat", jnp.float32, True, False),
        ("bf16+remat", jnp.bfloat16, True, False),
        ("bf16", jnp.bfloat16, False, False),
        ("bf16+hostrb", jnp.bfloat16, False, True),
    ]
    only = os.environ.get("AB_ONLY")
    batch_rb = None
    for name, dtype, remat, hostrb in variants:
        if only and name != only:
            continue
        if hostrb:
            if batch_rb is None:
                batch_rb = add_host_rulebooks(batch, b)
            batch_dev = jax.device_put(batch_rb, jax.devices()[0])
        model = VoxelNet(sparse_shape=(41, 1600, 1408), dtype=dtype,
                         backbone_remat=remat)
        try:
            # cpu-backend init (fast trace), then ship params
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                # conv_impl="gather" keeps init off the Pallas path (which
                # can't run on the CPU device); the param tree is identical
                state = create_train_state(
                    VoxelNet(sparse_shape=(41, 1600, 1408),
                             conv_impl="gather"), opt,
                    jax.tree_util.tree_map(np.asarray, batch), batch_size=b)
            state = jax.device_put(state, jax.devices()[0])
            step = jax.jit(make_train_step(model, opt, LossConfig(),
                                           compute_teacher_metrics=False))
            t0 = time.perf_counter()
            state2, metrics = step(state, batch_dev, jnp.float32(0.5))
            l0 = float(metrics["loss"])
            compile_s = time.perf_counter() - t0
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                state2, metrics = step(state2, batch_dev, jnp.float32(0.5))
            lf = float(metrics["loss"])
            dt = (time.perf_counter() - t0) / iters
            print(f"{name:12s}: {dt*1e3:8.1f} ms/step  "
                  f"(compile {compile_s:.0f}s, loss {l0:.3f}->{lf:.3f})")
        except Exception as e:  # OOM etc.
            print(f"{name:12s}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()
