"""A/B the decode+NMS share of the serving step on the real TPU.

The NMS IoU matrix is [pre, pre] rotated-polygon clipping (pre=1000
reference semantics), but realistic scenes pass far fewer boxes through
the 0.3 score threshold — candidate fast path: a small pre capacity with
an exact lax.cond fallback to 1000 (the wconv two-level pattern).
This script times the e2e step at pre in {1000, 512, 256, 128} plus a
no-NMS bound, batch 1 and 4, tuned windows. Run alone on the TPU.
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

    from bench import _init_variables
    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.models.predict import PredictConfig
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER
    from sessd_tpu.serve import (HostPreprocessor, make_infer_fn,
                                 serving_window_config)
    from sessd_tpu.utils.synth_scene import make_scene

    spec = KITTI_VOXELIZER
    caps = (20000, 22000, 18000, 12000, 8000)
    prep = HostPreprocessor(spec, caps)
    scenes = [np.asarray(make_scene(seed=s)[0]) for s in range(4)]
    for p in scenes[:prep.ring]:
        prep(p)
    anchors = jnp.asarray(create_anchors_3d_range(
        [1, 200, 176], [0, -40.0, -1.0, 70.4, 40.0, -1.0]).reshape(-1, 7))
    dev = jax.devices()[0]

    def fetch(out):
        return float(np.asarray(out[1][0, 0]))

    def stage(p):
        return (jax.device_put(p["feats"], dev),
                jax.tree_util.tree_map(lambda a: jax.device_put(a, dev),
                                       p["rulebooks"]))

    iters = 30
    variants = [("pre1000", dict(nms_pre_max_size=1000)),
                ("pre512", dict(nms_pre_max_size=512)),
                ("pre256", dict(nms_pre_max_size=256)),
                ("pre128", dict(nms_pre_max_size=128)),
                ("nonms", dict(nms_iou_threshold=2.0, nms_pre_max_size=100))]
    for bsz in (1, 4):
        model = VoxelNet(sparse_shape=spec.sparse_shape, dtype=jnp.bfloat16,
                         dense_from_stage=5, **serving_window_config(bsz))
        if bsz == 1:
            pp = [prep(s) for s in scenes]
        else:
            for _ in range(prep.ring):
                prep.batch(scenes[:1] * 4)
            pp = [prep.batch([scenes[(i + k) % 4] for k in range(4)])
                  for i in range(2)]
        staged = [stage(p) for p in pp]
        init_args = (pp[0]["feats"][:, None, :].astype(np.float32),
                     np.zeros((caps[0] * bsz, 4), np.int32),
                     np.ones((caps[0] * bsz,), np.int32),
                     np.zeros((caps[0] * bsz,), bool), bsz)
        variables = _init_variables(model, init_args, 5, jnp.bfloat16,
                                    spec.sparse_shape)
        # how many boxes actually pass the score threshold (sizes the
        # exact fast path)
        probe = make_infer_fn(model, variables, anchors,
                              PredictConfig(nms_pre_max_size=100,
                                            nms_iou_threshold=2.0),
                              caps, batch_size=bsz)
        for name, kw in variants:
            cfg = PredictConfig(**kw)
            infer = make_infer_fn(model, variables, anchors, cfg, caps,
                                  batch_size=bsz)
            out = infer(variables, *staged[0])
            fetch(out)
            for f, rb in staged:
                fetch(infer(variables, f, rb))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                for i in range(iters):
                    f, rb = staged[i % len(staged)]
                    out = infer(variables, f, rb)
                fetch(out)
                d = (time.perf_counter() - t0) / iters
                best = d if best is None else min(best, d)
            print(f"b{bsz} {name:8s}: {best * 1e3:6.2f} ms", flush=True)

    # count of above-threshold boxes per scene (host-side, from raw scores)
    import jax.nn
    model = VoxelNet(sparse_shape=spec.sparse_shape, dtype=jnp.bfloat16,
                     dense_from_stage=5, **serving_window_config(1))
    pp = [prep(s) for s in scenes]
    init_args = (pp[0]["feats"][:, None, :].astype(np.float32),
                 np.zeros((caps[0], 4), np.int32),
                 np.ones((caps[0],), np.int32),
                 np.zeros((caps[0],), bool), 1)
    variables = _init_variables(model, init_args, 5, jnp.bfloat16,
                                spec.sparse_shape)

    @jax.jit
    def raw_counts(v, f, rb):
        num_points = jnp.ones((caps[0],), jnp.int32)
        preds = model.apply(v, f[:, None, :],
                            jnp.zeros((caps[0], 4), jnp.int32), num_points,
                            jnp.zeros((caps[0],), bool), 1, train=False,
                            rulebooks=rb)
        sc = jax.nn.sigmoid(preds[0]["cls_preds"][..., 0])
        return (sc >= 0.3).sum()

    for i, p in enumerate(pp):
        f, rb = stage(p)
        print(f"scene{i}: above-threshold boxes = "
              f"{int(raw_counts(variables, f, rb))}")


if __name__ == "__main__":
    main()
