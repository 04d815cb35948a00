"""Chained-rep (fori_loop) A/B: Pallas windowed conv vs XLA gather conv."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from sessd_tpu.ops import sparse as sp
from sessd_tpu.ops.pallas.wconv import windowed_conv
from sessd_tpu.ops.voxelize import KITTI_VOXELIZER, voxelize_jax
from sessd_tpu.utils.synth_scene import make_scene

REPS = 30


def timed(name, body, x):
    def f(x):
        return jax.lax.fori_loop(0, REPS, lambda i, c: body(c), x)
    g = jax.jit(f)
    out = g(x)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = g(x)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:52s} {dt:8.3f} ms/op")


pts, _ = make_scene(0)
spec = KITTI_VOXELIZER
shape = (1,) + spec.sparse_shape
voxels, coords_zyx, num_points, _ = jax.jit(
    lambda p: voxelize_jax(p, spec))(jnp.asarray(pts))
coords = jnp.concatenate(
    [jnp.zeros((spec.max_voxels, 1), jnp.int32), coords_zyx], 1)
valid = coords_zyx[:, 0] >= 0
grid, _ = jax.jit(lambda c, v: sp.grid_from_coords(c, v, shape, 20000))(coords, valid)
grid = sp.SparseGrid(jnp.asarray(grid.ids), shape)
rb0 = jnp.asarray(jax.jit(lambda _: sp.subm_rulebook(grid))(0))
rng = np.random.RandomState(0)

for cin in (16, 32, 64):
    for dt_ in (jnp.float32, jnp.bfloat16):
        tag = f"{cin}ch {'f32' if dt_ == jnp.float32 else 'bf16'}"
        x0 = jnp.asarray(rng.randn(20000, cin).astype(np.float32), dt_)
        x0 = jnp.where(grid.mask[:, None], x0, 0.0)
        w = jnp.asarray(rng.randn(27, cin, cin).astype(np.float32) * 0.01, dt_)

        def xla_body(x):
            return sp.sparse_conv_apply(x, rb0, w, grid.mask) * 0.5 + x * 0.5

        timed(f"XLA gather conv {tag}", xla_body, x0)
        for window, block in ((512, 256), (768, 256), (1024, 512)):
            def pl_body(x, window=window, block=block):
                y = windowed_conv(x, rb0, w, grid.mask, window=window,
                                  block=block)
                return y * 0.5 + x * 0.5
            timed(f"pallas wconv W={window} B={block} {tag}", pl_body, x0)

# grad chained
x0 = jnp.asarray(rng.randn(20000, 16).astype(np.float32))
x0 = jnp.where(grid.mask[:, None], x0, 0.0)
w = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32) * 0.01)
t = jnp.asarray(rng.randn(20000, 16).astype(np.float32))

gp = jax.grad(lambda x: jnp.sum(sp.sparse_conv_apply(x, rb0, w, grid.mask) * t))
gw = jax.grad(lambda x: jnp.sum(windowed_conv(
    x, rb0, w, grid.mask, window=768, block=256) * t))
timed("grad XLA gather conv 16ch f32", lambda x: gp(x) * 0.5 + x * 0.5, x0)
timed("grad pallas wconv W=768 16ch f32", lambda x: gw(x) * 0.5 + x * 0.5, x0)
