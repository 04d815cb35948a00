"""Decompose the host-mode serving device step (~8.8 ms): fused sparse
backbone -> BEV, SSFA+head, decode+NMS. Each prefix is its own jit, timed
with pipelined submission + one readback. Run alone on the TPU."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(bsz=None):
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.models.predict import PredictConfig, predict_batch
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.serve import HostPreprocessor
    from sessd_tpu.utils.synth_scene import make_scene
    from bench import _init_variables

    spec = KITTI_VOXELIZER
    bsz = bsz if bsz is not None else int(os.environ.get("BK_BATCH", "1"))
    caps = (20000, 22000, 18000, 12000, 8000)
    model = VoxelNet(sparse_shape=spec.sparse_shape, dtype=jnp.bfloat16,
                     dense_from_stage=5,
                     fused_block=int(os.environ.get("BK_BLOCK", "0")))
    prep = HostPreprocessor(spec, caps)
    scenes = [np.asarray(make_scene(seed=s_)[0]) for s_ in range(bsz)]
    p = prep(scenes[0]) if bsz == 1 else prep.batch(scenes)
    dev = jax.devices()[0]
    feats = jax.device_put(p["feats"], dev)
    rb = jax.tree_util.tree_map(lambda a: jax.device_put(a, dev),
                                p["rulebooks"])
    anchors = jnp.asarray(create_anchors_3d_range(
        [1, 200, 176], [0, -40.0, -1.0, 70.4, 40.0, -1.0]).reshape(-1, 7))
    cfg = PredictConfig()
    cap0 = caps[0] * bsz
    init_args = (p["feats"][:, None, :].astype(np.float32),
                 np.zeros((cap0, 4), np.int32), np.ones((cap0,), np.int32),
                 np.zeros((cap0,), bool), bsz)
    variables = _init_variables(model, init_args, 5, jnp.bfloat16,
                                spec.sparse_shape)

    zero_coords = jnp.zeros((cap0, 4), jnp.int32)
    zero_valid = jnp.zeros((cap0,), bool)
    num_points = jnp.ones((cap0,), jnp.int32)

    def full(v, f, r):
        preds = model.apply(v, f[:, None, :], zero_coords, num_points,
                            zero_valid, bsz, train=False, rulebooks=r)
        dets = predict_batch(preds[0], anchors, None, cfg)
        return dets["scores"]

    def to_head(v, f, r):
        preds = model.apply(v, f[:, None, :], zero_coords, num_points,
                            zero_valid, bsz, train=False, rulebooks=r)
        return preds[0]["cls_preds"]

    variants = [("full (bench step)", full), ("through head", to_head)]
    for name, fn in variants:
        try:
            jf = jax.jit(fn)
            out = jf(variables, feats, rb)
            out = np.asarray(out)
            iters = 30
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jf(variables, feats, rb)
            _ = float(np.asarray(out).ravel()[0])
            dt = (time.perf_counter() - t0) / iters
            print(f"b{bsz} {name:20s}: {dt*1e3:7.2f} ms")
        except Exception as e:
            print(f"{name:20s}: FAILED {str(e)[:160]}")


if __name__ == "__main__":
    main()
