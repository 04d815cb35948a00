"""sys.modules stubs that let the reference's torch model code run on CPU.

The reference stack needs spconv (CUDA sparse conv lib), numba, torchvision,
tensorboardX, addict and the compiled iou3d_cuda extension — none available
here. For full-model parity goldens we only need the MODEL code paths
(scn.py / rpn_v1.py / mg_head_sessd.py / voxel_encoder.py) to execute, so:

- ``spconv`` is replaced by a *dense oracle*: SparseConvTensor carries a
  dense [B, C, D, H, W] tensor + occupancy mask; SubMConv3d = dense conv3d
  masked by input occupancy; SparseConv3d = strided dense conv masked by
  the covered-output rule. These are exactly the semantics our TPU engine
  is equivalence-tested against (tests/test_sparse_conv.py's lax.conv
  oracle), so goldens produced through this stub pin true spconv numerics.
- ``numba`` becomes no-op decorators (pure-Python execution).
- the rest are import-time placeholders never exercised by the captures.

Install with ``install()`` BEFORE importing anything from det3d.
"""
import sys
import types

import numpy as np
import torch
from torch import nn
from torch.nn import functional as F


def _triple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)


class SparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size,
                 dense=None, mask=None):
        self.features = features
        self.indices = indices
        self.spatial_shape = list(spatial_shape)
        self.batch_size = batch_size
        if dense is None:
            b = int(batch_size)
            c = features.shape[1]
            d, h, w = [int(s) for s in spatial_shape]
            dense = torch.zeros(b, c, d, h, w, dtype=features.dtype)
            mask = torch.zeros(b, 1, d, h, w, dtype=features.dtype)
            idx = indices.long()
            dense[idx[:, 0], :, idx[:, 1], idx[:, 2], idx[:, 3]] = features
            mask[idx[:, 0], 0, idx[:, 1], idx[:, 2], idx[:, 3]] = 1.0
        self._dense = dense
        self._mask = mask

    def dense(self):
        return self._dense.contiguous()


class _SparseConvBase(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True,
                 indice_key=None):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _triple(kernel_size)
        self.stride = _triple(stride)
        self.padding = _triple(padding)
        # spconv 1.x layout: [kd, kh, kw, in, out]
        self.weight = nn.Parameter(
            torch.randn(*self.kernel_size, in_channels, out_channels) * 0.05)
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        self.indice_key = indice_key

    def _conv(self, dense, stride, padding):
        w = self.weight.permute(4, 3, 0, 1, 2).contiguous()
        return F.conv3d(dense, w, bias=self.bias, stride=stride,
                        padding=padding)


class SubMConv3d(_SparseConvBase):
    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        pad = tuple(k // 2 for k in self.kernel_size)
        y = self._conv(x._dense, (1, 1, 1), pad) * x._mask
        return SparseConvTensor(x.features, x.indices, x.spatial_shape,
                                x.batch_size, dense=y, mask=x._mask)


class SparseConv3d(_SparseConvBase):
    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        y = self._conv(x._dense, self.stride, self.padding)
        ones = torch.ones(1, 1, *self.kernel_size, dtype=x._dense.dtype)
        cover = F.conv3d(x._mask, ones, stride=self.stride,
                         padding=self.padding)
        mask = (cover > 0).to(x._dense.dtype)
        y = y * mask
        shape = list(y.shape[2:])
        return SparseConvTensor(x.features, x.indices, shape, x.batch_size,
                                dense=y, mask=mask)


class SparseSequential(nn.Sequential):
    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        for m in self:
            if isinstance(m, _SparseConvBase):
                x = m(x)
            else:
                d = x._dense
                b, c, dd, hh, ww = d.shape
                flat = d.permute(0, 2, 3, 4, 1).reshape(-1, c)
                flat = m(flat)
                d2 = flat.reshape(b, dd, hh, ww, -1).permute(0, 4, 1, 2, 3)
                x = SparseConvTensor(x.features, x.indices, x.spatial_shape,
                                     x.batch_size, dense=d2 * x._mask,
                                     mask=x._mask)
        return x


def _make_numba():
    numba = types.ModuleType("numba")

    def _decorator(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda fn: fn

    numba.jit = _decorator
    numba.njit = _decorator
    numba.prange = range
    for t in ("float32", "float64", "int32", "int64", "boolean", "int8"):
        setattr(numba, t, None)
    cuda = types.ModuleType("numba.cuda")
    cuda.jit = _decorator
    cuda.declare_device = lambda *a, **k: None
    numba.cuda = cuda
    sys.modules["numba"] = numba
    sys.modules["numba.cuda"] = cuda


def _make_addict():
    addict = types.ModuleType("addict")

    class Dict(dict):
        def __init__(self, *args, **kwargs):
            super().__init__()
            for a in args:
                if a:
                    for k, v in dict(a).items():
                        self[k] = self._hook(v)
            for k, v in kwargs.items():
                self[k] = self._hook(v)

        @classmethod
        def _hook(cls, item):
            if isinstance(item, dict) and not isinstance(item, cls):
                return cls(item)
            if isinstance(item, (list, tuple)):
                return type(item)(cls._hook(x) for x in item)
            return item

        def __setattr__(self, k, v):
            self[k] = self._hook(v)

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                d = Dict()
                self[k] = d
                return d

        def __missing__(self, k):
            d = Dict()
            self[k] = d
            return d

    addict.Dict = Dict
    sys.modules["addict"] = addict


def install():
    # py2-era aliases the reference still uses (removed in py3.10+)
    import collections
    import collections.abc as _abc
    for _n in ("Iterable", "Sequence", "Mapping", "Callable", "Hashable"):
        if not hasattr(collections, _n):
            setattr(collections, _n, getattr(_abc, _n))

    # .cuda() no-ops: the reference hard-codes device moves in constructors
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    spconv = types.ModuleType("spconv")
    spconv.SparseConvTensor = SparseConvTensor
    spconv.SubMConv3d = SubMConv3d
    spconv.SparseConv3d = SparseConv3d
    spconv.SparseSequential = SparseSequential
    spconv.SparseInverseConv3d = SparseConv3d  # unused placeholder
    spconv.SparseModule = nn.Module
    sputils = types.ModuleType("spconv.utils")
    sputils.rbbox_intersection = None
    sputils.rbbox_iou = None
    sputils.VoxelGeneratorV2 = object
    spconv.utils = sputils
    sys.modules["spconv"] = spconv
    sys.modules["spconv.utils"] = sputils

    _make_numba()
    _make_addict()

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.resnet = types.ModuleType("torchvision.models.resnet")
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    sys.modules["torchvision.models.resnet"] = tvm.resnet

    for name in ("iou3d_cuda", "ifp"):
        sys.modules[name] = types.ModuleType(name)

    tt = types.ModuleType("terminaltables")
    tt.AsciiTable = object
    sys.modules["terminaltables"] = tt

    fire = types.ModuleType("fire")
    fire.Fire = lambda *a, **k: None
    sys.modules["fire"] = fire

    # the pybind11 boost-NMS extension (nms_gpu.py builds it with nvcc at
    # import time if absent) — runtime NMS is never called in the captures
    nmsso = types.ModuleType("det3d.ops.nms.nms")
    nmsso.non_max_suppression = None
    nmsso.non_max_suppression_cpu = None
    nmsso.rotate_non_max_suppression_cpu = None
    nmsso.IOU_weighted_rotate_non_max_suppression_cpu = None
    sys.modules["det3d.ops.nms.nms"] = nmsso

    sfl = types.ModuleType("det3d.ops.sigmoid_focal_loss.sigmoid_focal_loss_cuda")
    sfl.forward = None
    sfl.backward = None
    sys.modules["det3d.ops.sigmoid_focal_loss.sigmoid_focal_loss_cuda"] = sfl

    pc = types.ModuleType("pycocotools")
    pcc = types.ModuleType("pycocotools.coco")
    pcc.COCO = object
    pce = types.ModuleType("pycocotools.cocoeval")
    pce.COCOeval = object
    pcm = types.ModuleType("pycocotools.mask")
    pc.coco, pc.cocoeval, pc.mask = pcc, pce, pcm
    sys.modules.update({"pycocotools": pc, "pycocotools.coco": pcc,
                        "pycocotools.cocoeval": pce, "pycocotools.mask": pcm})

    # compiled syncbn kernels (never exercised: configs use plain BN)
    sg = types.ModuleType("det3d.ops.syncbn.syncbn_gpu")
    for fname in ("batch_norm_collect_statistics", "batch_norm_transform_input",
                  "batch_norm_collect_grad_statistics", "batch_norm_input_backward"):
        setattr(sg, fname, None)
    sys.modules["det3d.ops.syncbn.syncbn_gpu"] = sg

    tb = types.ModuleType("tensorboardX")
    tb.SummaryWriter = object
    sys.modules["tensorboardX"] = tb
