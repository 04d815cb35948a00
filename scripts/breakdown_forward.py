"""Forward-pass breakdown on the realistic scene (TPU) + rulebook span stats.

Times each piece of the current execution plan in isolation, and measures
the per-block source-index spans that size the Pallas windowed kernel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from sessd_tpu.ops import sparse as sp
from sessd_tpu.ops.voxelize import KITTI_VOXELIZER, voxelize_jax
from sessd_tpu.utils.synth_scene import make_scene

REPS = 30


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:50s} {dt:8.3f} ms")
    return out


pts, _ = make_scene(0)
points = jnp.asarray(pts)
spec = KITTI_VOXELIZER
shape = (1,) + spec.sparse_shape
caps = [20000, 22000, 18000, 12000, 8000]

print("== pipeline pieces ==")
vox_out = timed("voxelize_jax", lambda p: voxelize_jax(p, spec), points)
voxels, coords_zyx, num_points, _ = jax.tree_util.tree_map(jnp.asarray, vox_out)
coords = jnp.concatenate([jnp.zeros((spec.max_voxels, 1), jnp.int32), coords_zyx], 1)
valid = coords_zyx[:, 0] >= 0
vfe = jnp.asarray(np.random.RandomState(0).randn(spec.max_voxels, 4).astype(np.float32))

gout = timed("grid_from_coords (sort 20k)",
                   lambda c, v: sp.grid_from_coords(c, v, shape, caps[0])[0].ids,
                   coords, valid)
grid = sp.SparseGrid(jnp.asarray(gout), shape)
perm = jnp.arange(caps[0])
x0 = timed("perm gather [20k,4]", lambda f, p: f[p], vfe, perm)

rng = np.random.RandomState(1)
feats16 = jnp.asarray(rng.randn(caps[0], 16).astype(np.float32))
w16 = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32))

rb0 = timed("subm_rulebook s0 (20k)", lambda _: sp.subm_rulebook(grid), 0)
timed("conv s0 16->16 (x2 in model)",
      lambda f, r, w: sp.sparse_conv_apply(f, r, w, grid.mask), feats16, rb0, w16)

d01 = timed("downsample_rulebook 0->1",
            lambda _: sp.downsample_rulebook(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[1]),
            0)
grid1, rbd1 = d01
grid1 = sp.SparseGrid(jnp.asarray(grid1.ids), (1, 21, 800, 704))
w1632 = jnp.asarray(rng.randn(27, 16, 32).astype(np.float32))
timed("conv down 16->32 (22k out)",
      lambda f, r, w: sp.sparse_conv_apply(f, r, w, grid1.mask), feats16, jnp.asarray(rbd1), w1632)

feats32 = jnp.asarray(rng.randn(caps[1], 32).astype(np.float32))
w32 = jnp.asarray(rng.randn(27, 32, 32).astype(np.float32))
rb1 = timed("subm_rulebook s1 (22k)", lambda _: sp.subm_rulebook(grid1), 0)
timed("conv s1 32->32 (x2 in model)",
      lambda f, r, w: sp.sparse_conv_apply(f, r, w, grid1.mask), feats32, rb1, w32)

d12 = timed("downsample_rulebook 1->2",
            lambda _: sp.downsample_rulebook(grid1, (3, 3, 3), (2, 2, 2), (1, 1, 1), caps[2]),
            0)
grid2, rbd2 = d12
grid2 = sp.SparseGrid(jnp.asarray(grid2.ids), (1, 11, 400, 352))
w3264 = jnp.asarray(rng.randn(27, 32, 64).astype(np.float32))
timed("conv down 32->64 (18k out)",
      lambda f, r, w: sp.sparse_conv_apply(f, r, w, grid2.mask), feats32, jnp.asarray(rbd2), w3264)

feats64 = jnp.asarray(rng.randn(caps[2], 64).astype(np.float32))
timed("to_dense s2 (11,400,352,64)", lambda f: sp.to_dense(f, grid2), feats64)

# dense stages (what the hybrid currently runs from stage 2)
for dt_ in (jnp.float32, jnp.bfloat16):
    tag = "f32" if dt_ == jnp.float32 else "bf16"
    xd = jnp.asarray(rng.randn(1, 11, 400, 352, 64).astype(np.float32), dt_)
    w5 = jnp.asarray(rng.randn(3, 3, 3, 64, 64).astype(np.float32), dt_)

    def c3(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(dt_)
    timed(f"dense conv3d s2 64ch {tag} (x3 in model)", c3, xd, w5)
    xd3 = jnp.asarray(rng.randn(1, 5, 200, 176, 64).astype(np.float32), dt_)
    timed(f"dense conv3d s3 64ch {tag} (x4 in model)", c3, xd3, w5)

# continue sparse instead: s2/s3 rulebooks+convs at 64ch
rb2 = timed("subm_rulebook s2 (18k)", lambda _: sp.subm_rulebook(grid2), 0)
w64 = jnp.asarray(rng.randn(27, 64, 64).astype(np.float32))
timed("conv s2 sparse 64->64 (x3 in model)",
      lambda f, r, w: sp.sparse_conv_apply(f, r, w, grid2.mask), feats64, rb2, w64)
d23 = timed("downsample_rulebook 2->3",
            lambda _: sp.downsample_rulebook(grid2, (3, 3, 3), (2, 2, 2), (0, 1, 1), caps[3]),
            0)
grid3, rbd3 = d23
grid3 = sp.SparseGrid(jnp.asarray(grid3.ids), (1, 5, 200, 176))
print("stage occupancy:", int(np.asarray(grid.mask.sum())), int(np.asarray(grid1.mask.sum())),
      int(np.asarray(grid2.mask.sum())), int(np.asarray(grid3.mask.sum())))

# == span statistics for the windowed Pallas kernel ==
print("== per-block span stats (realistic scene) ==")
for name, rb, n_in in (("s0 subm", rb0, caps[0]), ("d0->1", jnp.asarray(rbd1), caps[0]),
                       ("s1 subm", rb1, caps[1]), ("d1->2", jnp.asarray(rbd2), caps[1]),
                       ("s2 subm", rb2, caps[2]), ("d2->3", jnp.asarray(rbd3), caps[2])):
    r = np.asarray(rb)
    for blk in (128, 256):
        n_out = r.shape[0]
        npad = (n_out + blk - 1) // blk * blk
        rp = np.full((npad, r.shape[1]), n_in, r.dtype)
        rp[:n_out] = r
        idx = rp.T.reshape(r.shape[1], -1, blk)
        valid_ = idx < n_in
        big = n_in + 10 ** 9
        lo = np.where(valid_, idx, big).min(-1)
        hi = np.where(valid_, idx, -1).max(-1)
        has = valid_.any(-1)
        span = np.where(has, hi - lo + 1, 0)
        print(f"{name:10s} blk={blk:4d} max span {span.max():6d}  "
              f"p99 {int(np.percentile(span, 99)):6d}  p90 {int(np.percentile(span, 90)):6d}")
