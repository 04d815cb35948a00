"""Microbench: pillar-engine primitives vs current voxel-row gathers (TPU).

Validates the pillar-sparse/z-dense redesign before building it:
  A. current: gather [N=17k, 27] rows of [C] from voxel features
  B. pillar:  gather [P=13k, 9] columns of [D, C] from pillar columns
  C. pillar conv: gather + conv2d kernel [9, 3, C, Cout] (full subm conv)
  D. BEV LUT build (memset 2.25M + scatter 13k) + 9-neighbor query
Each op is repeated inside one jit via fori_loop with a data dependency.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

P, D, C, COUT = 13000, 41, 16, 16
N = 17000
H, W = 1600, 1408
REPS = 50

rng = np.random.RandomState(0)


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    out = f(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:45s} {dt:8.3f} ms/op")
    return dt


def rep(body, x):
    def f(x):
        def step(i, c):
            return body(c)
        return jax.lax.fori_loop(0, REPS, step, x)
    return f


# realistic-ish monotone-ish indices
rb27 = np.sort(rng.randint(0, N, (N, 27)), axis=0).astype(np.int32)
rb9 = np.sort(rng.randint(0, P, (P, 9)), axis=0).astype(np.int32)

for dt_ in (jnp.float32, jnp.bfloat16):
    tag = "f32" if dt_ == jnp.float32 else "bf16"
    feats = jnp.asarray(rng.randn(N + 1, C), dt_)
    cols = jnp.asarray(rng.randn(P + 1, D, C), dt_)
    w27 = jnp.asarray(rng.randn(27 * C, COUT), dt_)
    w93 = jnp.asarray(rng.randn(9, 3, C, COUT), dt_)

    def gather27(f):
        g = f[rb27]  # [N, 27, C]
        return f.at[0].add(g[:1, 0, 0] * 1e-9)

    def conv27(f):
        g = f[rb27].reshape(N, 27 * C)
        o = jax.lax.dot_general(g, w27, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(dt_)
        return f.at[0, :COUT].add(o[0] * 1e-9)

    def gather9(c):
        g = c[rb9]  # [P, 9, D, C]
        return c.at[0].add(g[0, 0] * 1e-9)

    def pconv(c):
        g = c[rb9]  # [P, 9, D, C]
        gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (0, 0)))
        o = jax.lax.conv_general_dilated(
            gp, w93, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(dt_)  # [P, 1, D, COUT]
        return c.at[0].add(o[0, 0, :, :COUT] * 1e-9)

    timed(f"A gather27 rows [{N},27]x[{C}] {tag}", rep(gather27, feats), feats)
    timed(f"A+ conv27 gather+GEMM {tag}", rep(conv27, feats), feats)
    timed(f"B gather9 cols [{P},9]x[{D},{C}] {tag}", rep(gather9, cols), cols)
    timed(f"C pillar subm conv (gather+conv2d) {tag}", rep(pconv, cols), cols)

# D: LUT build + query (int32)
pids = jnp.asarray(np.sort(rng.choice(H * W, P, replace=False)).astype(np.int32))
nbr = jnp.asarray(rng.randint(0, H * W, (P, 9)).astype(np.int32))

def lut_query(x):
    lut = jnp.full((H * W + 1,), P, jnp.int32)
    lut = lut.at[pids + x[0] * 0].set(jnp.arange(P, dtype=jnp.int32))
    rows = lut[nbr]
    return x.at[0].add(rows[0, 0] % 2)

timed("D BEV LUT build+9-query", rep(lut_query, jnp.zeros((2,), jnp.int32)),
      jnp.zeros((2,), jnp.int32))

# E: scatter 20k voxel rows into pillar columns
vox = jnp.asarray(rng.randn(20000, C), jnp.float32)
dest = jnp.asarray(rng.choice(P * D, 20000, replace=False).astype(np.int32))

def scatter_cols(v):
    colsf = jnp.zeros((P * D + 1, C), jnp.float32)
    colsf = colsf.at[dest].set(v)
    return v.at[0].add(colsf[0] * 1e-9)

timed("E scatter 20k voxel rows -> columns", rep(scatter_cols, vox), vox)

# F: one full sort of 20k int32 (grid_from_coords cost)
ids = jnp.asarray(rng.randint(0, 2**30, 20000).astype(np.int32))

def sortop(x):
    s = jnp.sort(x)
    return x.at[0].add(s[0] % 2)

timed("F sort 20k int32", rep(sortop, ids), ids)
