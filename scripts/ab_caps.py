"""A/B serving stage capacities on the real TPU.

The fused serving kernels run a grid over CAPACITY-padded column blocks,
not occupied ones — stage caps sized for training safety margins
(20000, 22000, 18000, 12000, 8000) are ~2x the realistic occupancies at
stages 2-4 (17k/18k/8.8k/3.4k measured on ray-cast scenes), so the
expensive 64-channel stages spend half their blocks on zero padding.
This script times e2e serving at tighter caps; occupancy overflow would
truncate voxels (accuracy loss), so margins stay >= ~30% over measured.
Run alone on the TPU.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CONFIGS = {
    "base": (20000, 22000, 18000, 12000, 8000),
    "tight": (20000, 22000, 12000, 6000, 4000),
    "tighter": (18000, 20000, 11000, 5000, 3000),
}


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
    from sessd_tpu.serve import (HostPreprocessor, make_infer_fn,
                                 serving_window_config)
    from sessd_tpu.utils.synth_scene import make_scene

    spec = KITTI_VOXELIZER
    scenes = [np.asarray(make_scene(seed=s)[0]) for s in range(4)]
    anchors = jnp.asarray(create_anchors_3d_range(
        [1, 200, 176], [0, -40.0, -1.0, 70.4, 40.0, -1.0]).reshape(-1, 7))
    cfg = PredictConfig()
    dev = jax.devices()[0]
    iters = 30

    def fetch(out):
        return float(np.asarray(out[1][0, 0]))

    def stage(p):
        return (jax.device_put(p["feats"], dev),
                jax.tree_util.tree_map(lambda a: jax.device_put(a, dev),
                                       p["rulebooks"]))

    for name, caps in CONFIGS.items():
        prep = HostPreprocessor(spec, caps)
        for p in scenes[:prep.ring]:
            prep(p)
        # occupancy check: did any stage hit its cap?
        for bsz in (1, 4):
            model = VoxelNet(sparse_shape=spec.sparse_shape,
                             dtype=jnp.bfloat16, dense_from_stage=5,
                             stage_capacity=caps,
                             **serving_window_config(bsz))
            if bsz == 1:
                pp = [prep(s) for s in scenes]
            else:
                for _ in range(prep.ring):
                    prep.batch(scenes[:1] * 4)
                pp = [prep.batch([scenes[(i + k) % 4] for k in range(4)])
                      for i in range(2)]
            sent = np.iinfo(np.int32).max
            occ = [int(max((np.asarray(p["rulebooks"]["ids"][i]) < sent)
                           .sum() for p in pp)) for i in range(5)]
            staged = [stage(p) for p in pp]
            init_args = (pp[0]["feats"][:, None, :].astype(np.float32),
                         np.zeros((caps[0] * bsz, 4), np.int32),
                         np.ones((caps[0] * bsz,), np.int32),
                         np.zeros((caps[0] * bsz,), bool), bsz)
            variables = _serving_score_prior(_init_variables(
                model, init_args, 5, jnp.bfloat16, spec.sparse_shape))
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
            print(f"{name:8s} b{bsz}: {best * 1e3:6.2f} ms  occ={occ}",
                  flush=True)


if __name__ == "__main__":
    main()
