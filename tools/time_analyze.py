#!/usr/bin/env python
"""Micro-benchmarks of the hot kernels (tools/time_analyze.py equivalent):
rotated IoU matrix, NMS, voxelizer, ODIoU — host numpy vs device JAX."""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, warmup=2, iters=10):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1000)
    args = parser.parse_args()

    import jax.numpy as jnp

    from sessd_tpu.core import rotated_iou, rotated_iou_np
    from sessd_tpu.core.nms import rotate_nms
    from sessd_tpu.core.odiou import odiou_3d
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER, voxelize_jax, voxelize_np

    rng = np.random.RandomState(0)
    n = args.n
    boxes5 = np.stack([rng.uniform(0, 70, n), rng.uniform(-40, 40, n),
                       rng.uniform(1.5, 1.8, n), rng.uniform(3.5, 4.5, n),
                       rng.uniform(-np.pi, np.pi, n)], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    b5 = jnp.asarray(boxes5)

    import jax

    iou_fn = jax.jit(lambda a: rotated_iou.iou_bev_matrix(a, a, row_chunk=125))
    print(f"iou_bev [{n}x{n}] device: {timeit(lambda: iou_fn(b5)) * 1e3:.2f} ms")
    t0 = time.perf_counter()
    rotated_iou_np.iou_bev_matrix(boxes5[:200], boxes5[:200])
    print(f"iou_bev [200x200] host numpy: {(time.perf_counter() - t0) * 1e3:.2f} ms")

    nms_fn = jax.jit(lambda b, s: rotate_nms(b, s, pre_max_size=n,
                                             post_max_size=100, iou_threshold=0.01))
    print(f"rotate_nms [{n}] device: "
          f"{timeit(lambda: nms_fn(b5, jnp.asarray(scores))) * 1e3:.2f} ms")

    pts = np.concatenate(
        [rng.uniform(0, 70, (18000, 1)), rng.uniform(-40, 40, (18000, 1)),
         rng.uniform(-2, 0.5, (18000, 1)), rng.rand(18000, 1)], 1).astype(np.float32)
    vox_fn = jax.jit(lambda p: voxelize_jax(p, KITTI_VOXELIZER))
    print(f"voxelize 18k pts device: "
          f"{timeit(lambda: vox_fn(jnp.asarray(pts))) * 1e3:.2f} ms")
    t0 = time.perf_counter()
    voxelize_np(pts, KITTI_VOXELIZER)
    print(f"voxelize 18k pts host: {(time.perf_counter() - t0) * 1e3:.2f} ms")

    b7 = jnp.concatenate([b5[:, :2], jnp.zeros((n, 1)), b5[:, 2:4],
                          jnp.full((n, 1), 1.5), b5[:, 4:]], axis=1)
    od_fn = jax.jit(lambda a, b: odiou_3d(a, b))
    print(f"odiou [{n}] device: {timeit(lambda: od_fn(b7, b7)) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
