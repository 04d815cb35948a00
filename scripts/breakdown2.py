"""Chained-rep (fori_loop inside one jit) timings for the forward pieces —
the per-call method inflates with dispatch latency + output buffer churn."""
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


def timed(name, body, x):
    """body: x -> x (same shape/dtype), chained REPS times inside one jit."""
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
rng = np.random.RandomState(0)

# voxelize chained: perturb points slightly to carry dependency
def vox_body(p):
    v, c, n, _ = voxelize_jax(p, spec)
    return p + (v[0, 0, 0] * 1e-12)
timed("voxelize_jax", vox_body, jnp.asarray(pts))

def sort_body(c):
    g, perm = sp.grid_from_coords(c, valid, shape, 20000)
    return c + (g.ids[:1, None] % 2) * 0
timed("grid_from_coords (sort 20k)", sort_body, coords)

def rb_body(x):
    g = sp.SparseGrid(grid.ids + (x[0] % 2), shape)
    rb = sp.subm_rulebook(g)
    return x + rb[0, 0] % 2 * 0
timed("subm_rulebook s0", rb_body, jnp.zeros((2,), jnp.int32))

def ds_body(x):
    g = sp.SparseGrid(grid.ids + (x[0] % 2), shape)
    og, rb = sp.downsample_rulebook(g, (3, 3, 3), (2, 2, 2), (1, 1, 1), 22000)
    return x + (rb[0, 0] + og.ids[0]) % 2 * 0
timed("downsample_rulebook 0->1", ds_body, jnp.zeros((2,), jnp.int32))

rb0 = jnp.asarray(jax.jit(lambda _: sp.subm_rulebook(grid))(0))
x16 = jnp.asarray(rng.randn(20000, 16).astype(np.float32))
w16 = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32))

def conv_body(x):
    return sp.sparse_conv_apply(x, rb0, w16, grid.mask)
timed("conv s0 16->16 XLA gather", conv_body, x16)

# dense stage ops, chained with donation-friendly same-shape bodies
feats64 = jnp.asarray(rng.randn(18000, 64).astype(np.float32))
grid2 = sp.SparseGrid(
    jnp.asarray(jax.jit(lambda _: sp.downsample_rulebook(
        sp.downsample_rulebook(grid, (3, 3, 3), (2, 2, 2), (1, 1, 1), 22000)[0],
        (3, 3, 3), (2, 2, 2), (1, 1, 1), 18000)[0].ids)(0)),
    (1, 11, 400, 352))

def todense_body(f):
    d = sp.to_dense(f, grid2)
    return f + d[0, 0, 0, 0, :1] * 1e-12
timed("to_dense s2", todense_body, feats64)

for dt_ in (jnp.float32, jnp.bfloat16):
    tag = "f32" if dt_ == jnp.float32 else "bf16"
    xd = jnp.asarray(rng.randn(1, 11, 400, 352, 64).astype(np.float32), dt_)
    w5 = jnp.asarray(rng.randn(3, 3, 3, 64, 64).astype(np.float32) * 0.01, dt_)

    def c3_body(x):
        y = jax.lax.conv_general_dilated(
            x, w5, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(dt_)
        return y * 0.1  # same shape; keeps values bounded
    timed(f"dense conv3d s2 64ch {tag}", c3_body, xd)

    xd3 = jnp.asarray(rng.randn(1, 5, 200, 176, 64).astype(np.float32), dt_)
    def c3b_body(x):
        y = jax.lax.conv_general_dilated(
            x, w5, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(dt_)
        return y * 0.1
    timed(f"dense conv3d s3 64ch {tag}", c3b_body, xd3)
