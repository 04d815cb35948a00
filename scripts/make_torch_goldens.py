"""Generate full-model parity goldens from the reference's own torch code.

Runs the reference SE-SSD network (det3d VoxelNet: VFEv3 -> SpMiddleFHD ->
SSFA -> MultiGroupHead, built by the reference's own builder from its own
config file) on CPU with deterministic weights and a fixed ray-cast scene,
and records stage activations + the decode/rectification outputs
(mg_head_sessd.py:945-972 pre-NMS math). spconv is replaced by the dense
oracle in ref_stubs.py — the exact semantics our engine is tested against.

Weights are NOT stored: every parameter/buffer is filled deterministically
from its (name, shape) via zlib.crc32(name) so the consuming test
(tests/test_ref_goldens.py) regenerates the identical state dict.

Output: tests/goldens/ref_full_model.npz (committed artifact).
The scene is cropped to x in [0, 17.6), y in [-8, 8) so the oracle's dense
tensors stay CPU-sized; every layer still runs at its real channel widths.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import ref_stubs

ref_stubs.install()
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from sessd_tpu.ops.voxelize import VoxelizerSpec, voxelize_np  # noqa: E402
from sessd_tpu.utils.synth_scene import make_scene  # noqa: E402

CROP_SPEC = VoxelizerSpec(
    point_cloud_range=(0.0, -8.0, -3.0, 17.6, 8.0, 1.0),
    voxel_size=(0.05, 0.05, 0.1), max_points=5, max_voxels=20000)
ANCHOR_RANGE = [0.0, -8.0, -1.0, 17.6, 8.0, -1.0]


from tests.golden_utils import deterministic_value  # noqa: E402


def make_state_dict(model) -> dict:
    sd = {}
    for name, p in model.state_dict().items():
        if name.endswith("num_batches_tracked"):
            sd[name] = torch.zeros_like(p)
            continue
        sd[name] = torch.from_numpy(deterministic_value(name, tuple(p.shape)))
    return sd


def main():
    from det3d.models import build_detector
    from det3d.torchie import Config
    from det3d.core.bbox import box_torch_ops

    cfg = Config.fromfile("/root/reference/examples/second/configs/config.py")
    model = build_detector(cfg.model, train_cfg=None, test_cfg=cfg.test_cfg)
    model.load_state_dict(make_state_dict(model))
    model.eval()

    pts, _ = make_scene(seed=42)
    keep = ((pts[:, 0] < 17.6) & (np.abs(pts[:, 1]) < 8.0))
    pts = pts[keep]
    voxels, coords_zyx, num_points = voxelize_np(pts, CROP_SPEC)
    n = voxels.shape[0]
    print(f"crop: {pts.shape[0]} points, {n} voxels")

    coors = np.concatenate(
        [np.zeros((n, 1), np.int32), coords_zyx.astype(np.int32)], 1)
    t_voxels = torch.from_numpy(voxels)
    t_num = torch.from_numpy(num_points.astype(np.int32))
    t_coors = torch.from_numpy(coors)

    input_shape = np.array(CROP_SPEC.grid_size, dtype=np.int64)  # (nx, ny, nz)

    with torch.no_grad():
        reader_out = model.reader(t_voxels, t_num)
        bev = model.backbone(reader_out, t_coors, 1, input_shape)
        neck = model.neck(bev)
        preds = model.bbox_head(neck)[0]

        # anchors over the cropped BEV map (our generator is golden-tested
        # against the reference's create_anchors_3d_range in r1; the
        # reference's own fn trips on modern numpy's tuple meshgrid)
        from sessd_tpu.core.anchors import create_anchors_3d_range
        h, w = neck.shape[2], neck.shape[3]
        anchors = create_anchors_3d_range(
            [1, h, w], ANCHOR_RANGE, sizes=[1.6, 3.9, 1.56],
            rotations=[0, np.pi / 2]).reshape(-1, 7).astype(np.float32)
        t_anchors = torch.from_numpy(anchors)

        box_preds = preds["box_preds"].reshape(1, -1, 14)
        # the head predicts 7 box dims x2 anchors per cell interleaved:
        # [H, W, 2*7] -> [H*W*2, 7] (mg_head_sessd.py:909 reshape semantics)
        box_flat = box_preds.reshape(-1, 7)
        decoded = box_torch_ops.second_box_decode(box_flat, t_anchors)

        cls_flat = preds["cls_preds"].reshape(-1, 1)
        iou_flat = preds["iou_preds"].reshape(-1, 1)
        dir_flat = preds["dir_cls_preds"].reshape(-1, 2)
        scores = torch.sigmoid(cls_flat)[:, 0]
        # confidence rectification, mg_head_sessd.py:964-972
        rectified = scores * torch.pow((iou_flat[:, 0] + 1.0) * 0.5, 4)
        dir_labels = torch.argmax(dir_flat, dim=-1)

    # state-dict metadata so the consuming test regenerates the identical
    # weights from (name, shape) via deterministic_value — no 15MB of
    # weights in the repo
    sd_names = []
    sd_shapes = []
    for name, p in model.state_dict().items():
        if name.endswith("num_batches_tracked"):
            continue
        sd_names.append(name)
        sd_shapes.append(",".join(str(int(s)) for s in p.shape))

    out = {
        "sd_names": np.array(sd_names),
        "sd_shapes": np.array(sd_shapes),
        "points": pts.astype(np.float32),
        "voxels": voxels.astype(np.float32),
        "coords_zyx": coords_zyx.astype(np.int32),
        "num_points": num_points.astype(np.int32),
        "anchors": anchors,
        "reader_out": reader_out.numpy(),
        "backbone_bev": bev.numpy(),         # [1, 128, H, W] NCHW
        "neck_out": neck.numpy(),            # [1, 128, H, W]
        "box_preds": preds["box_preds"].numpy(),   # [1, H, W, 14]
        "cls_preds": preds["cls_preds"].numpy(),
        "iou_preds": preds["iou_preds"].numpy(),
        "dir_preds": preds["dir_cls_preds"].numpy(),
        "decoded_boxes": decoded.numpy(),
        "rectified_scores": rectified.numpy(),
        "dir_labels": dir_labels.numpy().astype(np.int32),
    }
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(dest, exist_ok=True)
    path = os.path.join(dest, "ref_full_model.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, f"{os.path.getsize(path) / 1e6:.2f} MB")
    for k, v in out.items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
