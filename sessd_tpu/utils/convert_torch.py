"""Convert reference (torch) SE-SSD checkpoints into our flax param tree.

The reference ships `.pth` checkpoints (README.md:35; saved by
trainer/checkpoint.py:189-220 as {state_dict, meta, optimizer}). This module
maps that state_dict onto the VoxelNet parameter/batch-stats pytree so a
user can validate inference parity without retraining (SURVEY §7 step 3).

Layer mappings (each covered by tests/test_convert_torch.py against real
torch modules):
- spconv SubMConv3d/SparseConv3d weight [kd, kh, kw, cin, cout]
  -> ours [K, cin, cout] (same raster order, plain reshape)
- torch Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]
- torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose
  [kh, kw, in, out] with a spatial flip (lax.conv_transpose does not
  mirror the kernel the way torch's transposed conv does)
- BatchNorm{1d,2d} weight/bias -> scale/bias; running stats -> batch_stats
- the backbone's final dense reshape keeps torch channel order c*D+d
  (backbone.py), so no permutation is needed downstream.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] -> flax ConvTranspose
    [kh, kw, in, out] (flipped spatially)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def sparse_conv_kernel(w: np.ndarray) -> np.ndarray:
    """spconv [kd, kh, kw, cin, cout] -> ours [K, cin, cout]."""
    kd, kh, kw, cin, cout = w.shape
    return w.reshape(kd * kh * kw, cin, cout).copy()


def bn_params(prefix: str, sd: Dict[str, np.ndarray]):
    return (
        {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
        {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]},
    )


# ---------------------------------------------------------------------------
# full-model mapping
# ---------------------------------------------------------------------------

# torch Sequential indices of (conv, bn) pairs in SpMiddleFHD.middle_conv
# (scn.py:105-151): conv at 3k, bn at 3k+1, relu at 3k+2, 14 blocks total.
_BACKBONE_BLOCKS = 14

# SSFA submodules in our call order (ssfa.py) -> torch module prefixes
# (rpn_v1.py:135-210); each is a (conv+bn) Sequential.
_SSFA_MODULES = [
    ("neck.bottom_up_block_0.1", "neck.bottom_up_block_0.2"),   # zero-pad shifts idx
    ("neck.bottom_up_block_0.4", "neck.bottom_up_block_0.5"),
    ("neck.bottom_up_block_0.7", "neck.bottom_up_block_0.8"),
    ("neck.bottom_up_block_1.0", "neck.bottom_up_block_1.1"),
    ("neck.bottom_up_block_1.3", "neck.bottom_up_block_1.4"),
    ("neck.bottom_up_block_1.6", "neck.bottom_up_block_1.7"),
    ("neck.trans_0.0", "neck.trans_0.1"),
    ("neck.trans_1.0", "neck.trans_1.1"),
    ("neck.deconv_block_0.0", "neck.deconv_block_0.1"),
    ("neck.deconv_block_1.0", "neck.deconv_block_1.1"),
    ("neck.conv_0.0", "neck.conv_0.1"),
    ("neck.conv_1.0", "neck.conv_1.1"),
    ("neck.w_0.0", "neck.w_0.1"),
    ("neck.w_1.0", "neck.w_1.1"),
]
_SSFA_TRANSPOSE = {8, 9}  # deconv blocks


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """torch state_dict -> (params, batch_stats) for models.VoxelNet.

    Accepts keys with or without a leading 'module.' (DDP wrap,
    trainer/checkpoint.py:117-129 strips it the same way).
    """
    sd = {k[7:] if k.startswith("module.") else k: np.asarray(v)
          for k, v in sd.items()}

    params: dict = {"backbone": {}, "neck": {}, "head": {}}
    stats: dict = {"backbone": {}, "neck": {}}

    # ---- backbone: 14 (sparse conv + masked BN) blocks in call order
    for b in range(_BACKBONE_BLOCKS):
        conv_key = f"backbone.middle_conv.{3 * b}.weight"
        bn_prefix = f"backbone.middle_conv.{3 * b + 1}"
        blk = f"SparseConvBlock_{b}"
        p, s = bn_params(bn_prefix, sd)
        params["backbone"][blk] = {
            "kernel": sparse_conv_kernel(sd[conv_key]),
            "MaskedBatchNorm_0": p,
        }
        stats["backbone"][blk] = {"MaskedBatchNorm_0": s}

    # ---- neck: 14 ConvBnRelu in call order
    for i, (conv_prefix, bn_prefix) in enumerate(_SSFA_MODULES):
        w = sd[conv_prefix + ".weight"]
        kernel = (conv_transpose2d_kernel(w) if i in _SSFA_TRANSPOSE
                  else conv2d_kernel(w))
        p, s = bn_params(bn_prefix, sd)
        inner = "ConvTranspose_0" if i in _SSFA_TRANSPOSE else "Conv_0"
        params["neck"][f"ConvBnRelu_{i}"] = {
            inner: {"kernel": kernel},
            "BatchNorm_0": p,
        }
        stats["neck"][f"ConvBnRelu_{i}"] = {"BatchNorm_0": s}

    # ---- head: task 0 1x1 convs (mg_head_sessd.py:196-230)
    head = {}
    for ours, theirs in [("conv_box", "conv_box"), ("conv_cls", "conv_cls"),
                         ("conv_iou", "conv_iou"), ("conv_dir", "conv_dir")]:
        prefix = f"bbox_head.tasks.0.{theirs}"
        if prefix + ".weight" not in sd:
            continue
        head[ours] = {
            "kernel": conv2d_kernel(sd[prefix + ".weight"]),
            "bias": sd[prefix + ".bias"],
        }
    params["head"] = {"task_0": head}

    return params, stats


def load_torch_checkpoint(path: str):
    """Read a reference .pth and return (params, batch_stats, meta)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    return (*convert_state_dict(sd), ckpt.get("meta", {}))
