"""A/B the Pallas windowed conv vs the XLA gather conv on realistic
rulebooks (TPU), fwd and bwd, plus numerical agreement on hardware."""
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

REPS = 50


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:58s} {dt:8.3f} ms")
    return out


pts, _ = make_scene(0)
spec = KITTI_VOXELIZER
shape = (1,) + spec.sparse_shape

voxels, coords_zyx, num_points, _ = jax.jit(
    lambda p: voxelize_jax(p, spec))(jnp.asarray(pts))
coords = jnp.concatenate(
    [jnp.zeros((spec.max_voxels, 1), jnp.int32), coords_zyx], 1)
valid = coords_zyx[:, 0] >= 0
grid, _ = jax.jit(
    lambda c, v: sp.grid_from_coords(c, v, shape, 20000))(coords, valid)
grid = sp.SparseGrid(jnp.asarray(grid.ids), shape)
rb0 = jnp.asarray(jax.jit(lambda _: sp.subm_rulebook(grid))(0))

rng = np.random.RandomState(0)

for cin, cout, tag_n in ((16, 16, "s0 16ch"), (32, 32, "s1 32ch"),
                         (64, 64, "s2 64ch")):
    for dt_ in (jnp.float32, jnp.bfloat16):
        tag = f"{tag_n} {'f32' if dt_ == jnp.float32 else 'bf16'}"
        x = jnp.asarray(rng.randn(20000, cin).astype(np.float32), dt_)
        x = jnp.where(grid.mask[:, None], x, 0.0)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32), dt_)

        ref = timed(f"XLA gather conv {tag}",
                    lambda x, w: sp.sparse_conv_apply(x, rb0, w, grid.mask), x, w)
        for window, block in ((512, 256), (768, 256), (768, 512), (2048, 256)):
            out = timed(f"pallas wconv W={window} B={block} {tag}",
                        lambda x, w: windowed_conv(
                            x, rb0, w, grid.mask, window=window, block=block),
                        x, w)
        err = np.max(np.abs(np.asarray(ref, np.float32)
                            - np.asarray(out, np.float32)))
        print(f"   max |diff| = {err:.2e}")

# backward A/B (f32, 16ch)
x = jnp.asarray(rng.randn(20000, 16).astype(np.float32))
x = jnp.where(grid.mask[:, None], x, 0.0)
w = jnp.asarray(rng.randn(27, 16, 16).astype(np.float32))
t = jnp.asarray(rng.randn(20000, 16).astype(np.float32))


def loss_plain(x, w):
    return jnp.sum(sp.sparse_conv_apply(x, rb0, w, grid.mask) * t)


def loss_win(x, w):
    return jnp.sum(windowed_conv(x, rb0, w, grid.mask,
                                 window=768, block=256) * t)


gp = timed("grad XLA gather conv f32 16ch",
           jax.grad(loss_plain, argnums=(0, 1)), x, w)
gw = timed("grad pallas wconv  f32 16ch",
           jax.grad(loss_win, argnums=(0, 1)), x, w)
for a, b, n in zip(gp, gw, ("dx", "dw")):
    err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
    rel = err / (np.max(np.abs(np.asarray(a))) + 1e-9)
    print(f"   grad {n}: max |diff| = {err:.2e} (rel {rel:.2e})")
