"""Ablate the wconv Pallas kernel to find the dominant per-(block,offset)
cost: dynamic window load vs one-hot build vs MXU dots vs loop overhead."""
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
WINDOW, BLOCK = 768, 256
NPAD = 20224
REPS = 30

rng = np.random.RandomState(0)
feats_t = jnp.asarray(rng.randn(CIN, N).astype(np.float32), jnp.bfloat16)
# realistic monotone rulebook: sorted columns
rb = np.sort(rng.randint(0, N - 1, (K, NPAD)), axis=1).astype(np.int32)
rb_t = jnp.asarray(rb)
nb = NPAD // BLOCK
lo = np.clip(rb.reshape(K, nb, BLOCK).min(-1) & ~127, 0, N + 128 - WINDOW)
lo_t = jnp.asarray(lo.astype(np.int32))
w2t = jnp.asarray(rng.randn(COUT, K * CIN).astype(np.float32), jnp.bfloat16)


def run_kernel(kernel_fn, k=K, name=""):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((k, BLOCK), lambda i, lo: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((COUT, BLOCK), lambda i, lo: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((k * CIN, BLOCK), feats_t.dtype)],
    )

    def f(x):
        def body(i, c):
            o = pl.pallas_call(
                kernel_fn,
                out_shape=jax.ShapeDtypeStruct((COUT, NPAD), feats_t.dtype),
                grid_spec=grid_spec,
            )(lo_t[:k], rb_t[:k], c, w2t[:, :k * CIN])
            return c.at[:, 0].add(o[:CIN, 0] * 1e-9)
        return jax.lax.fori_loop(0, REPS, body, x)

    g = jax.jit(f)
    out = g(feats_t)
    _ = np.asarray(out)[0, 0]
    t0 = time.perf_counter()
    out = g(feats_t)
    _ = np.asarray(out)[0, 0]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:44s} {dt:8.3f} ms/op")


def full_kernel(lo_ref, rb_ref, feat_ref, w_ref, out_ref, g_ref, *, k=K,
                static_lo=False, const_oh=False, static_win=False):
    i = pl.program_id(0)
    for kk in range(k):
        if static_win:
            win = feat_ref[:, :WINDOW]
        elif static_lo:
            win = feat_ref[:, pl.ds(128 * (kk % 8), WINDOW)]
        else:
            lo = pl.multiple_of(lo_ref[kk, i], 128)
            win = feat_ref[:, pl.ds(lo, WINDOW)]
        if const_oh:
            oh = jnp.full((WINDOW, BLOCK), 0.001, feat_ref.dtype)
        else:
            lo2 = lo_ref[kk, i]
            rel = rb_ref[kk:kk + 1, :] - lo2
            iota = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, BLOCK), 0)
            oh = (iota == rel).astype(feat_ref.dtype)
        g = jax.lax.dot_general(win, oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g_ref[kk * CIN:(kk + 1) * CIN, :] = g.astype(g_ref.dtype)
    out_ref[:] = jax.lax.dot_general(
        w_ref[:], g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


run_kernel(functools.partial(full_kernel), name="full kernel K=27")
run_kernel(functools.partial(full_kernel, k=9), k=9, name="K=9 (1/3 offsets)")
run_kernel(functools.partial(full_kernel, static_lo=True),
           name="static-ish lo (dyn slice, const idx)")
run_kernel(functools.partial(full_kernel, static_win=True),
           name="fully static window")
run_kernel(functools.partial(full_kernel, const_oh=True),
           name="const one-hot (no compare)")
run_kernel(functools.partial(full_kernel, const_oh=True, static_win=True),
           name="const oh + static win (dots only)")
