"""A/B window/block configs for the fused serving path on the real TPU.

Measured span distributions (3 realistic scenes, per-(offset, 256-block),
see CLAUDE.md r3 notes) give per-conv over-window block counts; the GEMM
cost model is nb*window_small + n_over*window_large per conv. This script
times the actual end-to-end step for candidate configs at batch 1 and 4.

Run alone on the TPU: python scripts/ab_windows.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CONFIGS = {
    "baseline": {},
    "opt": dict(subm_windows_small=(384, 512, 384, 256),
                down_windows_small=(640, 768, 256, 256),
                patch_max=32),
    "opt_pm64": dict(subm_windows_small=(384, 512, 384, 256),
                     down_windows_small=(640, 768, 256, 256),
                     patch_max=64),
    "opt_pm128": dict(subm_windows_small=(384, 512, 384, 256),
                      down_windows_small=(640, 768, 256, 256),
                      patch_max=128),
    "opt_block512": dict(subm_windows_small=(512, 640, 512, 384),
                         down_windows_small=(768, 1024, 384, 384),
                         patch_max=64, fused_block=512),
    # windows chosen so per-chain over counts stay <= 32 even at batch 4
    # (counts stack ~4x): the patch-kernel overhead at pm64+ cancels the
    # window savings, so keep pm32 everywhere
    "b4safe": dict(subm_windows_small=(384, 512, 384, 384),
                   down_windows_small=(640, 768, 768, 384),
                   patch_max=32),
    # b4safe with down1 restored to 1024 (its batched over-count is 36-38,
    # past patch_max at 768)
    "b4final": dict(subm_windows_small=(384, 512, 384, 384),
                    down_windows_small=(640, 1024, 768, 384),
                    patch_max=32),
}


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
    from sessd_tpu.serve import (HostPreprocessor, fallback_telemetry,
                                 make_infer_fn, window_config_from_detector)
    from sessd_tpu.utils.synth_scene import make_scene

    spec = KITTI_VOXELIZER
    caps = (20000, 22000, 18000, 12000, 8000)
    prep = HostPreprocessor(spec, caps)
    scenes = [np.asarray(make_scene(seed=s)[0]) for s in range(4)]
    for p in scenes[:prep.ring]:
        prep(p)
    anchors = jnp.asarray(create_anchors_3d_range(
        [1, 200, 176], [0, -40.0, -1.0, 70.4, 40.0, -1.0]).reshape(-1, 7))
    cfg = PredictConfig()
    dev = jax.devices()[0]

    def fetch(out):
        return float(np.asarray(out[1][0, 0]))

    def stage(p):
        return (jax.device_put(p["feats"], dev),
                jax.tree_util.tree_map(lambda a: jax.device_put(a, dev),
                                       p["rulebooks"]))

    iters = 30
    results = {}
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        kw = CONFIGS[name]
        model = VoxelNet(sparse_shape=spec.sparse_shape, dtype=jnp.bfloat16,
                         dense_from_stage=5, **kw)
        wcfg = window_config_from_detector(model)
        row = {}
        for bsz in (1, 4):
            if bsz == 1:
                pp = [prep(s) for s in scenes]
                cc = list(caps)
            else:
                for _ in range(prep.ring):
                    prep.batch(scenes[:1] * 4)
                pp = [prep.batch([scenes[(i + k) % 4] for k in range(4)])
                      for i in range(2)]
                cc = [c * 4 for c in caps]
            tel = fallback_telemetry(pp[0]["rulebooks"], cc, wcfg)
            staged = [stage(p) for p in pp]
            init_args = (pp[0]["feats"][:, None, :].astype(np.float32),
                         np.zeros((caps[0] * bsz, 4), np.int32),
                         np.ones((caps[0] * bsz,), np.int32),
                         np.zeros((caps[0] * bsz,), bool), bsz)
            variables = _init_variables(model, init_args, 5, jnp.bfloat16,
                                        spec.sparse_shape)
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
            row[f"b{bsz}_ms"] = best * 1e3
            row[f"b{bsz}_fb"] = tel["fallback_convs"]
            row[f"b{bsz}_patched"] = tel["patched_blocks"]
        results[name] = row
        print(f"{name:14s} b1 {row['b1_ms']:.2f} ms (fb={row['b1_fb']} "
              f"patch={row['b1_patched']})  b4 {row['b4_ms']:.2f} ms "
              f"(fb={row['b4_fb']} patch={row['b4_patched']})  "
              f"b4 rate {4000/row['b4_ms']:.1f}/s", flush=True)
    return results


if __name__ == "__main__":
    main()
