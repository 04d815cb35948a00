"""A/B: training conv_impl gather vs pallas at the production operating
point (B=4, bf16, dfs=3, host rulebooks) — SAME init state, 20 REAL
sequential steps each on REAL pipeline batches (synthetic KITTI root,
GT-AUG noise, real targets); prints per-step losses, the trajectory
delta, and the measured step time.

Context: conv_impl="auto" historically selected the XLA gather path in
train mode — set before the fused wconv fwd+bwd custom_vjp existed and
never re-measured. breakdown_train2.py shows the pallas step at ~198 ms vs
573 ms gather; this script is the end-to-end evidence (losses must track
within bf16 accumulation noise) for flipping the default.
"""
import pickle
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from train_ab import add_host_rulebooks  # noqa: E402


def make_real_batches(b, n_batches, seed0=0):
    """Full-scale (0.05 m grid) batches through the REAL pipeline:
    synthetic KITTI frames -> noise aug -> teacher snapshot -> voxelize x2
    -> targets x2, then loader-grade C++ host rulebooks."""
    from kitti_synth import make_kitti_root

    from sessd_tpu.data import kitti_common as kc
    from sessd_tpu.data.dataset import KittiDataset
    from sessd_tpu.data.loader import _stack_examples
    from sessd_tpu.data.pipeline import PipelineConfig
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.train.trainer import _device_batch

    root = Path(tempfile.mkdtemp(prefix="ab_")) / "kitti"
    nf = b * n_batches
    make_kitti_root(root, num_frames=nf, num_cars=8, pts_per_car=400,
                    ground_points=16000)
    infos = kc.create_kitti_info(root, list(range(nf)), num_workers=2)
    with open(root / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    cfg = PipelineConfig(
        voxelizer=KITTI_VOXELIZER, feature_map_size=(1, 200, 176),
        anchor_range=(0.0, -40.0, -1.0, 70.4, 40.0, -1.0),
        sa_dropout=None)
    ds = KittiDataset(str(root), str(root / "infos.pkl"), mode="train",
                      pipeline_cfg=cfg)
    anchors_np = ds.anchors.astype(np.float32)
    batches = []
    for k in range(n_batches):
        exs = [ds.get_sensor_data(k * b + i,
                                  rng=np.random.RandomState(seed0 + k * b + i))
               for i in range(b)]
        bt = _device_batch(_stack_examples(exs), anchors_np)
        bt = add_host_rulebooks(bt, b)
        batches.append(bt)
        pos = [int((bt["labels"][i] > 0).sum()) for i in range(b)]
        print(f"batch {k}: positives per sample {pos}", flush=True)
    return batches


def main(steps=20):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sessd_tpu.models import VoxelNet
    from sessd_tpu.train.losses import LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import create_train_state, make_train_step

    b = 4
    t0 = time.perf_counter()
    host_batches = make_real_batches(b, 2)
    print(f"pipeline prep: {time.perf_counter() - t0:.1f}s", flush=True)
    batches = [jax.device_put(bt, jax.devices()[0]) for bt in host_batches]
    opt = build_optimizer(OneCycleConfig(total_steps=200))

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state0 = create_train_state(
            VoxelNet(sparse_shape=(41, 1600, 1408), conv_impl="gather"),
            opt, jax.tree_util.tree_map(np.asarray, host_batches[0]),
            batch_size=b)
    state0 = jax.device_put(state0, jax.devices()[0])

    results = {}
    for impl in ("gather", "pallas"):
        model = VoxelNet(sparse_shape=(41, 1600, 1408), dtype=jnp.bfloat16,
                         backbone_remat=False, dense_from_stage=3,
                         conv_impl=impl)
        step = jax.jit(make_train_step(model, opt, LossConfig(),
                                       compute_teacher_metrics=False))
        state = state0
        losses = []
        t0 = time.perf_counter()
        state, m = step(state, batches[0], jnp.float32(0.5))
        losses.append(float(m["loss"]))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for s in range(1, steps):
            state, m = step(state, batches[s % 2], jnp.float32(0.5))
            losses.append(float(m["loss"]))
        dt = (time.perf_counter() - t0) / (steps - 1)
        gn = float(m["grad_norm"])
        results[impl] = losses
        print(f"{impl:7s}: {dt*1e3:7.1f} ms/step (compile {compile_s:.0f}s, "
              f"final grad_norm {gn:.3f})", flush=True)
        print("  losses:", " ".join(f"{l:.4f}" for l in losses), flush=True)

    g, p = np.array(results["gather"]), np.array(results["pallas"])
    rel = np.abs(g - p) / np.maximum(np.abs(g), 1e-6)
    print(f"trajectory max rel delta: {rel.max():.4f} "
          f"(mean {rel.mean():.4f})")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
