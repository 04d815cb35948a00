"""Sparse 3D middle backbone — TPU re-design of SpMiddleFHD (scn.py:92-189).

Stage plan (channels / resolution, input sparse shape (41, 1600, 1408)):
    2 x subm(4->16, 16->16)                       @ (41, 1600, 1408)
    spconv s2 p1 (16->32), 2 x subm(32)           @ (21,  800,  704)
    spconv s2 p1 (32->64), 3 x subm(64)           @ (11,  400,  352)
    spconv s2 p(0,1,1) (64->64), 3 x subm(64)     @ ( 5,  200,  176)
    spconv k(3,1,1) s(2,1,1) (64->64)             @ ( 2,  200,  176)
    -> dense [B, 2, 200, 176, 64] -> BEV [B, 200, 176, 128]

HYBRID execution (TPU-first): high-resolution stages run on the sparse
gather-GEMM engine (ops/sparse.py — rulebooks via device sorts), while from
``dense_from_stage`` on the grid is small enough (1.5M sites at stage 2)
that *masked dense* `lax.conv` on the MXU beats sparse gathers by an order
of magnitude. Masking preserves exact sparse semantics:
  - submanifold conv  == dense conv * input-occupancy mask,
  - strided sparse conv == dense strided conv * covered-output mask.
Parameters are laid out identically ([K, cin, cout]) in both paths, so
``dense_from_stage`` is a pure execution-plan choice — checkpoints and the
torch converter are unaffected.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sparse as sp
from ..ops.pallas.wconv import (cols_for, fused_conv_affine_t, prep_rulebook,
                                windowed_conv)
from .layers import MaskedBatchNorm


def _kaiming(k, cin):
    return nn.initializers.variance_scaling(2.0, "fan_in", "uniform", in_axis=-2, out_axis=-1)


class SparseConvBlock(nn.Module):
    """One sparse conv (subm or strided) + masked BN + ReLU, with an
    alternative dense execution path sharing the same parameters."""

    features: int
    kernel_volume: int
    use_norm: bool = True
    use_relu: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # dense-path geometry (kernel shape needed to unflatten [K, cin, cout])
    kernel_shape: Tuple[int, int, int] = (3, 3, 3)

    def _norm(self, x, mask, train):
        if self.use_norm:
            return MaskedBatchNorm(axis_name=self.axis_name, dtype=self.dtype)(
                x, mask, train)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return x + b.astype(self.dtype)

    def _kernel(self, cin):
        return self.param(
            "kernel", _kaiming(self.kernel_volume, cin),
            (self.kernel_volume, cin, self.features), jnp.float32)

    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    # sparse conv implementation: "auto" = fused Pallas windowed kernel on
    # TPU inference, XLA gather elsewhere; "pallas" / "gather" force one
    conv_impl: str = "auto"
    window: int = 768
    window_large: int = 0  # two-level fused kernel (0 = single window)
    fused_block: int = 256  # pallas grid block (output columns per program)

    @nn.compact
    def __call__(self, x, rulebook=None, out_mask=None, train: bool = False,
                 dense_inputs=None, transposed_inputs=None):
        """Sparse mode: (x [N, C], rulebook, out_mask). Dense mode:
        dense_inputs=(x [B, D, H, W, C], occ_out [B, D', H', W', 1]).
        Transposed serving mode: transposed_inputs=(x_t [Cin, cols], rb_t,
        lo, lo_l, pb, pvalid, span_ok, n_in) from
        ops.pallas.wconv.prep_rulebook — runs the fused
        conv+affine+ReLU+mask kernel (+ the large-window patch kernel for
        flagged blocks) and returns y_t [Cout, cols_out]."""
        strides, padding = self.strides, self.padding
        if transposed_inputs is not None:
            x_t, rb_t, lo, lo_l, pb, pvalid, span_ok, n_in = transposed_inputs
            cin = x_t.shape[0]
            w = self._kernel(cin)
            if self.use_norm:
                s, b = MaskedBatchNorm(
                    axis_name=self.axis_name, dtype=self.dtype)(
                        jnp.zeros((1, self.features), jnp.float32), None,
                        train, affine_only=True)
            else:
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                s = jnp.ones((self.features,), jnp.float32)
            # fold the BN scale into the GEMM weights: y = (s*W)@g + b
            w2t = (w.reshape(-1, self.features).T * s[:, None]).astype(self.dtype)
            return fused_conv_affine_t(
                x_t, rb_t, lo, lo_l, pb, pvalid, span_ok, w2t, b[:, None],
                n_in, window=self.window,
                window_large=self.window_large or None,
                block=self.fused_block,
                relu=self.use_relu,
                interpret=jax.default_backend() == "cpu")
        if dense_inputs is None:
            cin = x.shape[-1]
            w = self._kernel(cin).astype(self.dtype)
            # "auto": fused Pallas on TPU for inference always, and for
            # TRAINING when compute is bf16 — the windowed_conv custom_vjp
            # was validated grad-for-grad against the gather path at full
            # scale (pallas_bf16 vs gather_bf16 deltas are BELOW the
            # gather_bf16 vs gather_f32 noise floor) and is ~2.9x faster
            # (573 -> 198 ms full B=4 step, scripts/breakdown_train2.py).
            # f32 training stays on gather: the pallas bwd keeps the f32
            # dfeat accumulator VMEM-resident and exceeds the 16M scoped
            # limit at full-scale stage-2 caps (measured compile OOM).
            use_pallas = self.conv_impl == "pallas" or (
                self.conv_impl == "auto"
                and (not train or self.dtype == jnp.bfloat16)
                and jax.default_backend() != "cpu")
            if use_pallas:
                # fused windowed one-hot gather-GEMM (ops/pallas/wconv):
                # windows + one-hot live in VMEM, ~2x the XLA gather at the
                # 16/32ch stages; exact (span fallback inside)
                y = windowed_conv(x, rulebook, w, out_mask,
                                  window=self.window)
            else:
                y = sp.sparse_conv_apply(x, rulebook, w, out_mask)
            y = self._norm(y, out_mask, train)
        else:
            xd, occ_out = dense_inputs
            cin = xd.shape[-1]
            w = self._kernel(cin).astype(self.dtype)
            w5 = w.reshape(self.kernel_shape + (cin, self.features))
            # A/B-measured on v5e: native conv3d 84 ms total forward vs
            # 109 ms with the kd-slice conv2d decomposition — keep conv3d.
            # No preferred_element_type=f32: its conv transpose rule breaks
            # under grad with bf16 operands (cotangent dtype mismatch), and
            # the MXU accumulates bf16 convs in f32 internally anyway.
            y = jax.lax.conv_general_dilated(
                xd, w5, window_strides=strides,
                padding=[(p, p) for p in padding],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            ).astype(self.dtype)
            y = y * occ_out
            b, d, h, wd, c = y.shape
            flat_mask = occ_out.reshape(-1) > 0
            y = self._norm(y.reshape(-1, c), flat_mask, train).reshape(b, d, h, wd, c)
            # re-mask: BN's bias/mean shift makes unoccupied sites nonzero,
            # and the next conv would read them as (missing) neighbors —
            # breaking submanifold semantics (caught by the torch goldens)
            y = y * occ_out
        if self.use_relu:
            y = nn.relu(y)
        return y


def _conv3d_as_2d(x, w5, strides, padding):
    """3D conv decomposed into kd batched 2D convs (depth folded into batch).

    Exact same arithmetic as conv3d. Kept as an alternative execution plan:
    on the v5e both lowerings measured within noise for the stage-2+ grids,
    with native conv3d slightly ahead — SparseConvBlock uses conv3d.
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = w5.shape
    sd, sh, sw = strides
    pd, ph, pw = padding
    od = (d + 2 * pd - kd) // sd + 1
    xp = jnp.pad(x, ((0, 0), (pd, pd), (0, 0), (0, 0), (0, 0)))
    out = None
    for dz in range(kd):
        sl = jax.lax.slice_in_dim(xp, dz, dz + (od - 1) * sd + 1, sd, axis=1)
        y = jax.lax.conv_general_dilated(
            sl.reshape(b * od, h, w, cin), w5[dz],
            window_strides=(sh, sw), padding=[(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        out = y if out is None else out + y
    oh, ow = out.shape[1], out.shape[2]
    return out.reshape(b, od, oh, ow, cout)


def _cover_mask(occ, kernel, strides, padding):
    """Occupancy -> covered-output mask for a strided conv (sparse output
    coordinate semantics: a site exists iff its window sees >= 1 voxel)."""
    k = jnp.ones(kernel + (1, 1), occ.dtype)
    c = jax.lax.conv_general_dilated(
        occ, k, window_strides=strides, padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return (c > 0).astype(occ.dtype)


class SpMiddleFHD(nn.Module):
    """Sparse middle extractor; returns BEV features [B, H, W, C*D]."""

    num_input_features: int = 4
    use_norm: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # per-sample voxel capacity at each sparse resolution
    stage_capacity: Tuple[int, ...] = (20000, 22000, 18000, 12000, 8000)
    # resolution index (0..4) from which to execute densely on the MXU;
    # stage 2 = (11, 400, 352), small enough for masked dense conv
    dense_from_stage: int = 2
    # rematerialize block activations in the backward pass — without it the
    # dense-stage f32 activations of a batch-4 training step overflow 16G HBM
    remat: bool = True
    # sparse conv implementation + PER-STAGE Pallas window sizes. Spans are
    # scene-density-dependent: measured on realistic ray-cast scenes the
    # per-256-block source spans are ~765/1650/1010/610 rows for the subm
    # rulebooks of stages 0-3 (stage 1+ grids are denser per y-row after
    # each 2x downsample) and ~700/1780/1300/520 for the strided ones —
    # windows must cover them or the conv silently falls back to the slow
    # exact gather path inside lax.cond.
    conv_impl: str = "auto"
    subm_window: int = 768      # back-compat scalar (stage-0 / tests)
    down_window: int = 2048     # back-compat scalar
    # measured per-offset-per-block spans (exact prep_rulebook semantics,
    # realistic ray-cast scenes): subm 765/1645/952/609 at batch 1,
    # 767/1731/1153/609 batched x4; down 703/1774/944/520 and
    # 730/1774/1622/538 — but UNAUGMENTED teacher chains in training reach
    # subm1 2157 / down1 2031 / subm2 1261 / subm0 877, i.e. past or within
    # one row of the old (896, 2048, 1280, 768)/(1024, 2048, 1792, 768)
    # large windows, silently tripping whole convs to the gather fallback
    # every step. These LARGE windows bound only the patch kernel (a few
    # blocks per conv), but its GEMM width still shows up in serving (2560
    # at stage 1 cost ~2% e2e; 2304 — one 128-block above the worst
    # measured span — is the measured sweet spot). Exactness bound: any
    # block whose span exceeds the LARGE window trips the whole conv to
    # the gather fallback (counted by serve.fallback_telemetry, logged
    # one-time by Trainer for train/eval chains and by bench.py).
    # NOTE: 2304 leaves ~147 rows of headroom over the worst span measured
    # on synthetic ray-cast scenes (2157). Real-data deployments with
    # denser scans should check the fallback_convs telemetry on their own
    # distribution before trusting the throughput numbers — a fallback is
    # exact but ~7x slower.
    subm_windows: Tuple[int, ...] = (1024, 2304, 1536, 768)
    down_windows: Tuple[int, ...] = (1280, 2304, 2048, 896)
    # two-level fused kernel: the common-case slice width (~p99 of the
    # per-(offset, block) span distribution; the one-hot GEMM FLOPs scale
    # linearly with it), with the rare long-span blocks taking the LARGE
    # window in-kernel. 0 disables the second level.
    subm_windows_small: Tuple[int, ...] = (512, 512, 640, 640)
    down_windows_small: Tuple[int, ...] = (640, 1024, 1024, 512)
    fused_block: int = 256
    # max patch-kernel blocks per conv before the whole conv falls back to
    # the gather path; per-(chain) over-span counts scale with the batch
    # (batched serving stacks scenes into one chain), so batched plans need
    # roughly batch x the single-scene count
    patch_max: int = 32

    @nn.compact
    def __call__(self, voxel_features, coords_bzyx, valid, batch_size: int,
                 sparse_shape, train: bool = False, rulebooks=None):
        """``rulebooks``: optional precomputed rulebook chain (host-built by
        native/rulebook.cpp via utils.native.build_rulebooks, or any dict
        with the same arrays): {"perm" [cap0], "ids" [5 x cap_i],
        "subm" [4 x (cap_i, 27)], "down" [4 x (cap_i+1, K_i)]}. When given,
        all device-side rulebook construction (sorts + occupancy-LUT
        lookups, ~75% of the serving forward) is skipped; coords_bzyx/valid
        are ignored. int16 rulebooks are upcast in-graph."""
        d, h, w = sparse_shape
        d3 = ((d - 1) // 2 + 1 - 1) // 2 + 1
        d4 = (d3 - 3) // 2 + 1
        assert (d4 - 3) // 2 + 1 >= 1, (
            f"sparse depth {d} collapses before the final stage; the "
            f"SpMiddleFHD geometry needs a 40+1-deep z grid (scn.py:106-149)")
        shape = (batch_size, d, h, w)
        caps = [c * batch_size for c in self.stage_capacity]
        dfs = min(max(self.dense_from_stage, 1), 5)

        # stage plan: (channels, n_subm, down_kernel, down_stride, down_pad)
        plan = [
            (16, 2, None, None, None),                     # stage 0
            (32, 2, (3, 3, 3), (2, 2, 2), (1, 1, 1)),      # stage 1
            (64, 3, (3, 3, 3), (2, 2, 2), (1, 1, 1)),      # stage 2
            (64, 3, (3, 3, 3), (2, 2, 2), (0, 1, 1)),      # stage 3
            (64, 0, (3, 1, 1), (2, 1, 1), (0, 0, 0)),      # stage 4
        ]

        blk = [0]  # running block index for stable parameter names

        # remat: recompute block activations in backward (self is argnum 0,
        # so `train` sits at static position 4)
        block_cls = (nn.remat(SparseConvBlock, static_argnums=(4,))
                     if self.remat else SparseConvBlock)

        def block(feats, kvol, kshape=(3, 3, 3), strides=(1, 1, 1),
                  padding=(1, 1, 1), window=None, window_large=0,
                  fused=False):
            cls = SparseConvBlock if fused else block_cls
            m = cls(
                feats, kvol, self.use_norm, axis_name=self.axis_name,
                dtype=self.dtype, kernel_shape=kshape,
                strides=strides, padding=padding,
                conv_impl=self.conv_impl,
                window=window or self.subm_window,
                window_large=window_large,
                fused_block=self.fused_block,
                name=f"SparseConvBlock_{blk[0]}")
            blk[0] += 1
            return m

        rbs = rulebooks
        if rbs is not None:
            rbs = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a).astype(jnp.int32), rbs)
            grid = sp.SparseGrid(ids=rbs["ids"][0], shape=shape)
            perm = rbs["perm"]
        else:
            grid, perm = sp.grid_from_coords(coords_bzyx, valid, shape,
                                             capacity=caps[0])
        x = voxel_features[perm]
        x = jnp.where(grid.mask[:, None], x, 0.0)

        def stage_down(grid, stage, dk, ds, dp):
            """Strided-transition grid + rulebook: precomputed or on-device."""
            if rbs is not None:
                out_shape = sp.downsample_out_shape(grid.shape, dk, ds, dp)
                return (sp.SparseGrid(ids=rbs["ids"][stage], shape=out_shape),
                        rbs["down"][stage - 1])
            return sp.downsample_rulebook(grid, dk, ds, dp, caps[stage])

        def stage_subm(grid, stage):
            if rbs is not None:
                return rbs["subm"][stage]
            return sp.subm_rulebook(grid)

        # fused transposed serving plan: all-sparse, Pallas fused
        # conv+affine+ReLU kernels, features kept in [C, cols] layout across
        # the whole backbone (2 transposes total instead of 2 per conv),
        # rulebook prep shared across each stage's convs
        use_fused = (not train and dfs >= 5
                     and self.conv_impl in ("auto", "pallas", "fused")
                     and (jax.default_backend() != "cpu"
                          or self.conv_impl == "fused"))
        if use_fused:
            x_t = jnp.zeros((x.shape[-1], cols_for(caps[0], self.fused_block)),
                            self.dtype)
            x_t = jax.lax.dynamic_update_slice(
                x_t, x.T.astype(self.dtype), (0, 0))
            for stage, (feats, n_subm, dk, ds, dp) in enumerate(plan):
                if stage > 0:
                    grid_new, rbd = stage_down(grid, stage, dk, ds, dp)
                    dwl = self.down_windows[stage - 1]
                    dw = (min(self.down_windows_small[stage - 1], dwl)
                          if self.down_windows_small[stage - 1] else dwl)
                    prep = prep_rulebook(rbd, caps[stage - 1],
                                         cols_for(caps[stage - 1],
                                                  self.fused_block),
                                         window=dw, window_large=dwl,
                                         patch_max=self.patch_max,
                                         block=self.fused_block)
                    x_t = block(feats, int(np.prod(dk)), dk,
                                window=dw, window_large=dwl, fused=True)(
                        None, train=train,
                        transposed_inputs=(x_t, *prep, caps[stage - 1]))
                    grid = grid_new
                if n_subm > 0:
                    swl = self.subm_windows[stage]
                    sw = (min(self.subm_windows_small[stage], swl)
                          if self.subm_windows_small[stage] else swl)
                    prep = prep_rulebook(stage_subm(grid, stage), caps[stage],
                                         cols_for(caps[stage],
                                                  self.fused_block),
                                         window=sw, window_large=swl,
                                         patch_max=self.patch_max,
                                         block=self.fused_block)
                    for _ in range(n_subm):
                        x_t = block(feats, 27, window=sw, window_large=swl,
                                    fused=True)(
                            None, train=train,
                            transposed_inputs=(x_t, *prep, caps[stage]))
            x = x_t[:, :caps[4]].T
            dense_x = sp.to_dense(x, grid)
            b, dd, hh, ww, c = dense_x.shape
            return jnp.transpose(dense_x, (0, 2, 3, 4, 1)).reshape(
                b, hh, ww, c * dd)

        dense_x = None
        occ = None
        for stage, (feats, n_subm, dk, ds, dp) in enumerate(plan):
            if stage > 0:
                # strided transition into this stage; the transition INTO
                # stage dfs still runs sparse (densifying at the previous,
                # larger resolution would cost a multi-GB tensor)
                if stage <= dfs:
                    grid_new, rbd = stage_down(grid, stage, dk, ds, dp)
                    x = block(feats, int(np.prod(dk)), dk,
                              window=self.down_windows[stage - 1])(
                        x, rbd, grid_new.mask, train)
                    grid = grid_new
                else:
                    occ_new = _cover_mask(occ, dk, ds, dp)
                    dense_x = block(feats, int(np.prod(dk)), dk, ds, dp)(
                        None, None, None, train, (dense_x, occ_new))
                    occ = occ_new
            if stage >= dfs and dense_x is None:
                dense_x = sp.to_dense(x, grid)
                occ = (sp.to_dense(jnp.ones_like(x[:, :1]), grid) > 0).astype(
                    self.dtype)
            # submanifold convs at this resolution
            if n_subm > 0:
                if stage < dfs:
                    rb = stage_subm(grid, stage)
                    for _ in range(n_subm):
                        x = block(feats, 27,
                                  window=self.subm_windows[stage])(
                            x, rb, grid.mask, train)
                else:
                    for _ in range(n_subm):
                        dense_x = block(feats, 27)(
                            None, None, None, train, (dense_x, occ))

        if dense_x is None:
            dense_x = sp.to_dense(x, grid)
        b, dd, hh, ww, c = dense_x.shape
        # channel order c*D + d matches the reference's [N, C, D, H, W] ->
        # [N, C*D, H, W] view (scn.py:186-188), so torch checkpoints map 1:1
        return jnp.transpose(dense_x, (0, 2, 3, 4, 1)).reshape(b, hh, ww, c * dd)
