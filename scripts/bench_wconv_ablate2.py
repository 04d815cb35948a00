"""Chase the fixed ~1.7ms pallas_call cost: empty kernels, grid size,
scalar-prefetch on/off, feature-residency."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

N, CIN, COUT, K = 20096, 16, 16, 27
NPAD = 20224
REPS = 30
rng = np.random.RandomState(0)
feats_t = jnp.asarray(rng.randn(CIN, N).astype(np.float32), jnp.bfloat16)
rb = np.sort(rng.randint(0, N - 1, (K, NPAD)), axis=1).astype(np.int32)
rb_t = jnp.asarray(rb)
w2t = jnp.asarray(rng.randn(COUT, K * CIN).astype(np.float32), jnp.bfloat16)


def timed(name, g, x):
    out = g(x)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = g(x)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:52s} {dt:8.3f} ms/op")


def bench_empty(block, prefetch, name, feats_in=True):
    nb = NPAD // block
    lo = np.clip(rb.reshape(K, nb, block).min(-1) & ~127, 0, N + 128 - 768)
    lo_t = jnp.asarray(lo.astype(np.int32))

    def kernel(*refs):
        out_ref = refs[-1]
        out_ref[:] = jnp.zeros_like(out_ref)

    in_specs = [pl.BlockSpec((K, block), (lambda i, lo: (0, i)) if prefetch
                             else (lambda i: (0, i)),
                             memory_space=pltpu.VMEM)]
    if feats_in:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if prefetch:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,), in_specs=in_specs,
            out_specs=pl.BlockSpec((COUT, block), lambda i, lo: (0, i),
                                   memory_space=pltpu.VMEM))
    else:
        grid_spec = pl.GridSpec(
            grid=(nb,), in_specs=in_specs,
            out_specs=pl.BlockSpec((COUT, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM))

    def f(x):
        def body(i, c):
            args = [rb_t]
            if feats_in:
                args.append(c)
            args.append(w2t)
            if prefetch:
                args = [lo_t] + args
            o = pl.pallas_call(
                kernel, out_shape=jax.ShapeDtypeStruct((COUT, NPAD), c.dtype),
                grid_spec=grid_spec)(*args)
            return c.at[:, 0].add(o[:CIN, 0] * 1e-9)
        return jax.lax.fori_loop(0, REPS, body, x)

    timed(name, jax.jit(f), feats_t)


bench_empty(256, True, "empty kernel B=256 prefetch feats-resident")
bench_empty(256, True, "empty kernel B=256 prefetch no-feats", feats_in=False)
bench_empty(256, False, "empty kernel B=256 no-prefetch no-feats", feats_in=False)
bench_empty(512, True, "empty kernel B=512 prefetch feats-resident")
bench_empty(1024, True, "empty kernel B=1024 prefetch feats-resident")

# the glue alone: windowed_conv minus the pallas call (span/lo math, pads,
# transposes) — approximated by running with an identity-cheap conv
from sessd_tpu.ops import sparse as sp
from sessd_tpu.ops.pallas.wconv import windowed_conv

grid_ids = None
x_nc = jnp.asarray(rng.randn(20000, CIN).astype(np.float32), jnp.bfloat16)
w3 = jnp.asarray(rng.randn(K, CIN, COUT).astype(np.float32), jnp.bfloat16)
rb_nc = jnp.asarray(np.sort(rng.randint(0, 20000, (20000, K)), 0).astype(np.int32))
mask = jnp.ones((20000,), bool)


def glue_body(x):
    y = windowed_conv(x, rb_nc, w3, mask, window=768, block=256)
    return y * 0.5 + x * 0.5


timed("full windowed_conv (glue + kernel)", jax.jit(
    lambda x: jax.lax.fori_loop(0, REPS, lambda i, c: glue_body(c), x)), x_nc)
