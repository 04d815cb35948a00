"""Settle the r3->r4 batch-1 p50 'regression' (28.8 -> 35.0 ms,
BENCH_r03/r04.json; VERDICT r4 weak #5).

bench.py's serialized latency samples each include a forced device->host
readback through the axon tunnel (fetch), so every sample carries a full
tunnel RTT on top of the ~6 ms device step. bench.py's PIPELINED rate
(the headline scenes/sec) barely moved r3->r4 (174.3 -> 171.0), and
bench.py does NOT route through serve.ExactBatchServer (it jits
make_infer_fn directly) -- so the r4 serving changes cannot have altered
the serialized path. This script measures the within-process spread of
the p50 itself: the identical serialized loop repeated R times in one
process. If the spread covers several ms, the r3->r4 delta is tunnel RTT
weather, not a code regression.

Run alone on the TPU: python scripts/ab_p50.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import _init_variables, _serving_score_prior
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.models.predict import PredictConfig
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.serve import (SERVING_CAPS, HostPreprocessor,
                                 make_infer_fn, serving_window_config)
    from sessd_tpu.utils.synth_scene import make_scene

    sparse_shape = (41, 1600, 1408)
    model = VoxelNet(sparse_shape=sparse_shape, dtype=jnp.bfloat16,
                     dense_from_stage=5, conv_impl="auto",
                     stage_capacity=SERVING_CAPS, **serving_window_config(1))
    caps = model.stage_capacity
    prep = HostPreprocessor(KITTI_VOXELIZER, caps)
    scenes = [np.asarray(make_scene(seed=s)[0]) for s in range(4)]
    for pts in scenes[:prep.ring]:
        prep(pts)
    prepped = [prep(pts) for pts in scenes]
    dev = jax.devices()[0]
    staged = [(jax.device_put(p["feats"], dev),
               jax.tree_util.tree_map(lambda a: jax.device_put(a, dev),
                                      p["rulebooks"]))
              for p in prepped]
    anchors = jnp.asarray(create_anchors_3d_range(
        [1, 200, 176], [0, -40.0, -1.0, 70.4, 40.0, -1.0]).reshape(-1, 7))
    init_args = (prepped[0]["feats"][:, None, :].astype(np.float32),
                 np.zeros((caps[0], 4), np.int32),
                 np.ones((caps[0],), np.int32),
                 np.zeros((caps[0],), bool), 1)
    variables = _serving_score_prior(
        _init_variables(model, init_args, 5, jnp.bfloat16, sparse_shape))
    infer = make_infer_fn(model, variables, anchors, PredictConfig(), caps)

    def fetch(out):
        return float(np.asarray(out[1][0, 0]))

    fetch(infer(variables, *staged[0]))
    for f, rb in staged:
        out = infer(variables, f, rb)
    fetch(out)

    iters, reps = 30, 6
    p50s = []
    for r in range(reps):
        lat = []
        for i in range(iters):
            f, rb = staged[i % len(staged)]
            t1 = time.perf_counter()
            fetch(infer(variables, f, rb))
            lat.append(time.perf_counter() - t1)
        p50 = float(np.percentile(lat, 50)) * 1e3
        p90 = float(np.percentile(lat, 90)) * 1e3
        lo = float(np.min(lat)) * 1e3
        p50s.append(p50)
        print(f"rep {r}: p50 {p50:.2f} ms  p90 {p90:.2f}  min {lo:.2f}",
              flush=True)
    print(f"p50 spread across reps: {min(p50s):.2f} .. {max(p50s):.2f} ms "
          f"(r3 28.8, r4 35.0)", flush=True)


if __name__ == "__main__":
    main()
