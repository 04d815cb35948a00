"""Pallas TPU gather kernels — the hot primitive of the sparse conv engine.

XLA's dynamic gather on TPU runs ~7 ns/element (scalarized on the scalar
core), which made the rulebook/feature gathers dominate the SE-SSD forward
(~4-7 ms per 500k-row gather). This kernel keeps the (small) table resident
in VMEM and streams index blocks through SMEM, issuing one dynamic-slice
row copy per index — a VMEM-to-VMEM vector move instead of a scalarized
HBM gather.

Constraints: table must fit VMEM (N*C*4B <~ 8MB — true for every backbone
stage: 20k x 64 f32 = 5.1MB; pad C to a multiple of 128 lanes for layout).
Falls back to plain ``table[idx]`` when the shape doesn't qualify.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block",))
def gather_rows_pallas(table: jnp.ndarray, idx: jnp.ndarray, block: int = 2048):
    """out[i, :] = table[idx[i], :] — Pallas VMEM gather.

    table: [N, C] float32/bfloat16 (N*C small enough for VMEM);
    idx: [M] int32 in [0, N).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = table.shape
    m = idx.shape[0]
    c_pad = _round_up(c, 128)
    m_pad = _round_up(m, block)
    if c_pad != c:
        table = jnp.pad(table, ((0, 0), (0, c_pad - c)))
    if m_pad != m:
        idx = jnp.pad(idx, (0, m_pad - m))

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
            return 0

        jax.lax.fori_loop(0, block, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(m_pad // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, c_pad), table.dtype),
    )(idx, table)
    return out[:m, :c]


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                vmem_budget: int = 8 * 1024 * 1024) -> jnp.ndarray:
    """Row gather with automatic Pallas/XLA dispatch."""
    n, c = table.shape
    c_pad = _round_up(c, 128)
    bytes_needed = n * c_pad * table.dtype.itemsize
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and bytes_needed <= vmem_budget and idx.ndim == 1:
        return gather_rows_pallas(table, idx)
    return table[idx]
