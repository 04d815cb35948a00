"""Serving pipeline: native host preprocessing + device-resident inference.

TPU-first serving split (reference: spconv builds its rulebooks on-GPU per
call, det3d voxelizes on CPU in the loader — here BOTH are host-native):

  host (C++):  FCFS voxelize (native/voxelize.cpp) -> per-voxel mean VFE
               -> full rulebook chain (native/rulebook.cpp), int16-compressed
  device:      one jit = VFE passthrough + fused Pallas sparse backbone
               (rulebooks fed as static-shape int16 gather maps) + SSFA +
               head + decode + rotated NMS

Rationale (measured, v5e): on-device rulebook construction costs ~49 ms of
the 67 ms batch-1 forward (occupancy-LUT lookups ~15 ns/query + candidate
sorts are scalar-core bound); host C++ builds the same tables in ~3-6 ms and
they ship as ~3.5 MB of int16 per scene (PCIe-negligible on a real host).
The prep is embarrassingly parallel across loader workers, so sustained
throughput is the device rate.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from .data.rulebooks import DOWNS
from .ops.voxelize import VoxelizerSpec
from .utils.native import get_native


class HostPreprocessor:
    """points [P, 4] -> device-ready feats + int16 rulebook chain (numpy)."""

    def __init__(self, spec: VoxelizerSpec,
                 stage_capacity=(20000, 22000, 18000, 12000, 8000),
                 num_input_features: int = 4, ring: int = 4):
        self.spec = spec
        self.caps = [int(c) for c in stage_capacity]
        self.nif = num_input_features
        self.native = get_native()
        if self.native is None:
            raise RuntimeError("native toolchain unavailable; host serving "
                               "path requires native/rulebook.cpp")
        # ring of reusable rulebook output buffers: steady-state prep does
        # no large allocations (fresh ~50-80 MB mmaps stall for seconds
        # under THP once the heap is churned — see native.rulebook_scratch).
        # ALIASING CONTRACT: a returned rulebook dict is valid until `ring`
        # further prep calls with the same (caps, dtype); consume (e.g.
        # device_put) within that window.
        self.ring = int(ring)
        self._scratch: dict = {}

    def _next_scratch(self, caps, out_dtype):
        key = (tuple(int(c) for c in caps), np.dtype(out_dtype))
        ring = self._scratch.setdefault(key, {"sets": [], "i": 0})
        if len(ring["sets"]) < self.ring:
            ring["sets"].append(
                self.native.rulebook_scratch(caps, DOWNS, out_dtype))
        ring["i"] = (ring["i"] + 1) % len(ring["sets"])
        return ring["sets"][ring["i"]]

    def __call__(self, points: np.ndarray) -> dict:
        spec = self.spec
        voxels, coords_zyx, num_pts = self.native.voxelize(
            points, spec.point_cloud_range, spec.voxel_size, spec.max_points,
            min(spec.max_voxels, self.caps[0]))
        n = coords_zyx.shape[0]
        cap0 = self.caps[0]
        feats = np.zeros((cap0, self.nif), np.float32)
        feats[:n] = (voxels[..., :self.nif].sum(1)
                     / np.maximum(num_pts, 1)[:, None])
        coords = np.zeros((cap0, 4), np.int32)
        coords[:n, 1:] = coords_zyx
        valid = np.zeros((cap0,), bool)
        valid[:n] = True
        d, h, w = spec.sparse_shape
        # capacities < 2^15: the C++ writes rulebooks/perm as int16 directly
        # (no cast pass); ids stay int32
        out_dtype = np.int16 if max(self.caps) < 2 ** 15 else np.int32
        rb = self.native.build_rulebooks(
            coords, valid, (1, d, h, w), self.caps, DOWNS,
            out_dtype=out_dtype,
            scratch=self._next_scratch(self.caps, out_dtype))
        return {"feats": feats, "rulebooks": rb}

    def batch(self, scenes) -> dict:
        """Batched variant: one rulebook chain over the (B, D, H, W) grid
        (throughput serving — the 17k-voxel batch-1 graph underutilizes the
        chip; batching amortizes the fixed per-kernel cost)."""
        spec = self.spec
        b = len(scenes)
        cap0 = self.caps[0]
        feats = np.zeros((b * cap0, self.nif), np.float32)
        coords = np.zeros((b * cap0, 4), np.int32)
        valid = np.zeros((b * cap0,), bool)
        for s, points in enumerate(scenes):
            voxels, coords_zyx, num_pts = self.native.voxelize(
                points, spec.point_cloud_range, spec.voxel_size,
                spec.max_points, min(spec.max_voxels, cap0))
            n = coords_zyx.shape[0]
            o = s * cap0
            feats[o:o + n] = (voxels[..., :self.nif].sum(1)
                              / np.maximum(num_pts, 1)[:, None])
            coords[o:o + n, 0] = s
            coords[o:o + n, 1:] = coords_zyx
            valid[o:o + n] = True
        d, h, w = spec.sparse_shape
        caps_b = [c * b for c in self.caps]
        out_dtype = np.int16 if max(caps_b) < 2 ** 15 else np.int32
        rb = self.native.build_rulebooks(
            coords, valid, (b, d, h, w), caps_b, DOWNS, out_dtype=out_dtype,
            scratch=self._next_scratch(caps_b, out_dtype))
        return {"feats": feats, "rulebooks": rb}


def _span_stats(rb: np.ndarray, n_in: int, window: int, window_large: int,
                patch_max: int, block: int):
    """Numpy twin of prep_rulebook's span logic for one rulebook [N, K]."""
    n_out, k = rb.shape
    cols_out = -(-n_out // block) * block
    idx = np.full((cols_out, k), n_in, np.int32)
    idx[:n_out] = rb
    idx = idx.T.reshape(k, cols_out // block, block)
    valid = idx < n_in
    has = valid.any(-1)
    lo = np.where(valid, idx, n_in + 1).min(-1) & ~np.int32(127)
    hi = np.where(valid, idx, -1).max(-1)
    span = np.where(has, hi - lo, 0)
    over_b = (span >= window).any(0)          # [nb] blocks past the small win
    n_over = int(over_b.sum())
    too_large = bool((span >= window_large).any())
    fallback = too_large or (window_large > window and n_over > patch_max) \
        or (window_large <= window and n_over > 0)
    return {"n_over": n_over, "max_span": int(span.max(initial=0)),
            "fallback": fallback}


def fallback_telemetry(rulebooks, caps, model, patch_max: int = 0) -> dict:
    """Per-conv span telemetry for a host-built rulebook chain.

    Computes, host-side, exactly what prep_rulebook will decide in-graph
    (sessd_tpu/ops/pallas/wconv.py:196-250): how many 256-column blocks of
    each conv exceed the small window (they run the patch kernel) and
    whether any conv will trip the WHOLE-conv gather fallback — the silent
    ~7x serving slowdown that windows are tuned to avoid. `caps` are the
    batched per-stage capacities matching the chain; `model` supplies the
    configured windows (SpMiddleFHD fields).
    """
    patch_max = patch_max or getattr(model, "patch_max", 32)
    convs = {}
    for i in range(4):
        small = model.subm_windows_small[i] or model.subm_windows[i]
        convs[f"subm{i}"] = _span_stats(
            np.asarray(rulebooks["subm"][i]), caps[i], small,
            model.subm_windows[i], patch_max, model.fused_block)
    for i in range(4):
        small = model.down_windows_small[i] or model.down_windows[i]
        convs[f"down{i}"] = _span_stats(
            np.asarray(rulebooks["down"][i]), caps[i], small,
            model.down_windows[i], patch_max, model.fused_block)
    # capacity saturation: a stage whose id table is FULL truncated voxels
    # (the chain drops the overflow) — an accuracy signal, not a perf one
    sentinel = np.iinfo(np.int32).max
    ids = rulebooks.get("ids") if hasattr(rulebooks, "get") else None
    saturated = [] if ids is None else [
        i for i in range(len(caps))
        if int((np.asarray(ids[i]) < sentinel).sum()) >= caps[i]]
    return {
        "convs": convs,
        "fallback_convs": sum(c["fallback"] for c in convs.values()),
        "patched_blocks": sum(c["n_over"] for c in convs.values()
                              if not c["fallback"]),
        "cap_saturated_stages": saturated,
    }


# Serving stage capacities (scripts/ab_caps.py, v5e): the fused kernels run
# a grid over CAPACITY-padded column blocks, so the training-safety caps
# (20000, 22000, 18000, 12000, 8000) spend ~half their stage-2..4 blocks on
# zero padding (realistic occupancies 17.4k/18.8k/9.5k/3.7k/2.8k). Tightening
# stages 2-4 to ~30-60% margin cuts the 64-channel stages' block counts:
# b1 6.82 -> 6.01 ms, b4 18.96 -> 15.98 ms (250 scenes/s). Occupancy past a
# cap TRUNCATES voxels (accuracy loss) — fallback_telemetry reports
# cap_saturated_stages so a denser deployment sees the signal.
SERVING_CAPS = (20000, 22000, 12000, 6000, 4000)


def serving_window_config(batch_size: int) -> dict:
    """Measured-optimal Pallas window config for the fused serving plan.

    TPU A/B (scripts/ab_windows.py, v5e, realistic ray-cast scenes): the
    one-hot conv's GEMM FLOPs scale linearly with the small window, and the
    per-conv over-window block counts scale with the batch (batched chains
    stack scenes), so the optimum is batch-dependent:
      batch<=2: b1 8.44 -> 7.97 ms with the tighter set below;
      batch>=3: the tight set trips down1/down2 past patch_max at 4x
                counts — restoring them gives b4 24.52 -> 22.89 ms
                (174.7 scenes/s) with zero fallbacks.
    block=512 and BEV-tile row reordering are measured NEGATIVE (see
    CLAUDE.md r3 notes); patch_max>32 costs more than it saves at b<=4.

    batch>4: over-window block counts and worst-case spans keep stacking
    (measured b8: n_over up to 54, spans to 2135; b16: 110/2161) — scale
    patch_max ~linearly and lift the three large windows the spans exceed,
    else five of the eight convs trip the whole-conv gather fallback.
    """
    # the LARGE (patch-kernel) windows are left at the SpMiddleFHD defaults:
    # ray-cast scenes at other seeds reach subm1 spans ~2160 (> the 2048
    # these branches were first measured with — seed luck, not headroom),
    # and the patch-kernel cost of the lift is ~0.1 ms (few blocks/conv)
    # vs a ~7x whole-conv fallback when a dense scan exceeds the window
    if batch_size <= 2:
        return dict(subm_windows_small=(384, 512, 384, 256),
                    down_windows_small=(640, 768, 256, 256),
                    patch_max=32)
    if batch_size <= 4:
        return dict(subm_windows_small=(384, 512, 384, 384),
                    down_windows_small=(640, 1024, 768, 384),
                    patch_max=32)
    return dict(subm_windows_small=(384, 512, 384, 384),
                down_windows_small=(640, 1024, 768, 384),
                # elementwise max of the measured b8/b16 lifts and the
                # SpMiddleFHD defaults (span headroom, see above)
                subm_windows=(1152, 2304, 1536, 768),
                down_windows=(1280, 2304, 2304, 896),
                # worst measured n_over/scene ~ 7 (down2, b8/b16); invalid
                # patch programs are a cheap @pl.when skip, so size with
                # ~1.7x headroom
                patch_max=12 * batch_size)


def window_config_from_detector(detector):
    """Resolve the effective Pallas window config of a VoxelNet detector
    (its overrides over the SpMiddleFHD defaults) for fallback_telemetry."""
    from .models.backbone import SpMiddleFHD

    kw = {}
    for name in ("subm_windows", "down_windows", "subm_windows_small",
                 "down_windows_small"):
        if getattr(detector, name, None):
            kw[name] = tuple(getattr(detector, name))
    if getattr(detector, "fused_block", 0):
        kw["fused_block"] = detector.fused_block
    if getattr(detector, "patch_max", 0):
        kw["patch_max"] = detector.patch_max
    return SpMiddleFHD(**kw)


# training-safety capacities: ~2x realistic stage occupancies (the loader /
# Trainer default; scripts/ab_caps.py) — the exact-fallback target when a
# denser-than-expected scene saturates the tighter SERVING_CAPS
TRAIN_CAPS = (20000, 22000, 18000, 12000, 8000)


def saturated_stages(rulebooks, caps) -> list:
    """Stages whose id table is FULL — the chain truncated (or exactly
    filled) that stage's voxels. Conservative: an exactly-full untruncated
    stage also reports, which only costs a needless exact re-run."""
    sentinel = np.iinfo(np.int32).max
    return [i for i in range(len(caps))
            if int((np.asarray(rulebooks["ids"][i]) < sentinel).sum())
            >= caps[i]]


class ExactBatchServer:
    """Serving front end with an automatic EXACT fallback on capacity
    saturation.

    The fast path preps + infers at the tight SERVING_CAPS (the kernels
    grid over capacity-padded blocks, so tighter caps are ~12-16% faster —
    scripts/ab_caps.py). A scene denser than the caps were sized for would
    silently TRUNCATE voxels at the saturated stage (the one remaining
    silent-wrongness path in serving, VERDICT r3) — so every batch's chain
    is checked host-side (ids-table-full, O(sum caps) numpy) and a
    saturated batch is re-prepped and re-run at the training-safety
    ``safe_caps``, whose stage-0 cap equals the reference's own
    max_voxel_num=20000 truncation point (config.py:174-180): outputs stay
    exact wherever the reference's are. The safe program compiles lazily on
    the first saturated batch (cached thereafter); ``stats`` counts both
    paths for telemetry.
    """

    def __init__(self, model, variables, anchors, predict_cfg, spec,
                 serving_caps=SERVING_CAPS, safe_caps=TRAIN_CAPS,
                 batch_size: int = 1):
        if any(s < f for s, f in zip(safe_caps, serving_caps)):
            raise ValueError("safe_caps must dominate serving_caps elementwise")
        self.variables = variables
        self.batch_size = int(batch_size)
        self.fast_prep = HostPreprocessor(spec, serving_caps)
        self.safe_prep = HostPreprocessor(spec, safe_caps)
        self.fast_caps = [int(c) for c in serving_caps]
        self.safe_caps = [int(c) for c in safe_caps]
        self._mk = lambda caps: make_infer_fn(
            model.clone(stage_capacity=tuple(caps)), variables, anchors,
            predict_cfg, caps, batch_size=self.batch_size)
        self.fast_infer = self._mk(self.fast_caps)
        self._safe_infer = None
        # a saturated stage only warrants the fallback where the safe caps
        # actually add headroom — equal-cap stages (e.g. stage 0 ==
        # max_voxel_num, the reference's own truncation point) saturate
        # identically on both paths
        self._fixable = [i for i in range(len(self.fast_caps))
                         if self.safe_caps[i] > self.fast_caps[i]]
        self.stats = {"fast": 0, "exact_fallback": 0, "safe_saturated": 0}

    def _prep(self, prep, scenes):
        if self.batch_size == 1 and len(scenes) == 1:
            return prep(scenes[0])
        assert len(scenes) == self.batch_size
        return prep.batch(scenes)

    def __call__(self, scenes):
        """scenes: list of [P, 4] point arrays (len == batch_size) ->
        (box3d_lidar, scores, valid) device arrays."""
        p = self._prep(self.fast_prep, scenes)
        caps_b = [c * self.batch_size for c in self.fast_caps]
        sat = set(saturated_stages(p["rulebooks"], caps_b))
        if not sat.intersection(self._fixable):
            self.stats["fast"] += 1
            return self.fast_infer(self.variables, p["feats"], p["rulebooks"])
        self.stats["exact_fallback"] += 1
        if self._safe_infer is None:
            self._safe_infer = self._mk(self.safe_caps)
        p = self._prep(self.safe_prep, scenes)
        safe_b = [c * self.batch_size for c in self.safe_caps]
        # stage 0 full at safe caps == the reference's own 20k-voxel
        # truncation point; stages 1+ full means denser than 2x KITTI —
        # surface it, don't hide it
        if saturated_stages(p["rulebooks"], safe_b):
            self.stats["safe_saturated"] += 1
        return self._safe_infer(self.variables, p["feats"], p["rulebooks"])


def make_infer_fn(model, variables, anchors, predict_cfg, caps,
                  batch_size: int = 1):
    """Returns a jitted (variables, feats, rulebooks) -> detections function.

    The VFE is the parameter-free per-voxel mean, so host-computed features
    pass through it unchanged via voxels=feats[:, None, :], num_points=1.
    coords/valid are unused when rulebooks are supplied (grid order and
    masks come from the shipped ids). batch_size > 1 consumes
    HostPreprocessor.batch outputs; decode/NMS vmaps over the batch.
    """
    import jax
    import jax.numpy as jnp

    from .models.predict import predict_batch

    rows = caps[0] * batch_size
    zero_coords = jnp.zeros((rows, 4), jnp.int32)
    zero_valid = jnp.zeros((rows,), bool)

    @functools.partial(jax.jit)
    def infer(variables, feats, rulebooks):
        voxels = feats[:, None, :]
        num_points = jnp.ones((rows,), jnp.int32)
        preds = model.apply(variables, voxels, zero_coords, num_points,
                            zero_valid, batch_size, train=False,
                            rulebooks=rulebooks)
        dets = predict_batch(preds[0], anchors, None, predict_cfg)
        return dets["box3d_lidar"], dets["scores"], dets["valid"]

    return infer
