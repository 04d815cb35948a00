"""Composed SE-SSD loss parity vs the reference's own torch code.

Goldens (tests/goldens/ref_sessd_loss.npz, scripts/make_sessd_loss_goldens.py)
were produced by the reference's MultiGroupHead.loss() + consistency_loss()
+ get_model_ema_loss() (mg_head_sessd.py:618-889) built by the reference's
own builder, with the CUDA IoU matching stubs replaced by our numpy twins.
Pins every scalar loss term and the gradients of
(supervised_total + 0.5 * consistency) w.r.t. the student prediction
tensors against our detection_loss / consistency_loss.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sessd_tpu.train.losses import (ConsistencyConfig, LossConfig,
                                    consistency_loss, detection_loss)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "ref_sessd_loss.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN, allow_pickle=True)


def _cfg(g):
    a = g["anchors"].shape[1]
    return LossConfig(consistency=ConsistencyConfig(
        top_k=a, post_center_range=tuple(g["post_center_range"].tolist())))


def _batch(g):
    return {
        "anchors": jnp.asarray(g["anchors"]),
        "labels": jnp.asarray(g["labels"]),
        "reg_targets": jnp.asarray(g["reg_targets"]),
        "labels_raw": jnp.asarray(g["labels_raw"]),
        "reg_targets_raw": jnp.asarray(g["reg_targets_raw"]),
        "transformation": {
            "flipped": jnp.asarray(g["flipped"]),
            "noise_rotation": jnp.asarray(g["noise_rotation"]),
            "noise_scale": jnp.asarray(g["noise_scale"]),
        },
    }


def _preds(g, who):
    return {"box_preds": jnp.asarray(g[f"{who}_box"]),
            "cls_preds": jnp.asarray(g[f"{who}_cls"]),
            "iou_preds": jnp.asarray(g[f"{who}_iou"]),
            "dir_cls_preds": jnp.asarray(g[f"{who}_dir"])}


def _close(ours, ref, rtol=2e-4, name=""):
    ours, ref = float(ours), float(ref)
    assert abs(ours - ref) <= rtol * (abs(ref) + 1e-3), (
        f"{name}: ours={ours:.6f} ref={ref:.6f}")


def test_supervised_terms(g):
    total, m = detection_loss(_preds(g, "stu"), _batch(g), _cfg(g))
    _close(total, g["scalar_loss"], name="loss")
    for k in ("cls_loss_reduced", "loc_loss_reduced", "dir_loss_reduced",
              "iou_pred_loss", "ious_loss", "cls_pos_loss", "cls_neg_loss"):
        _close(m[k], g[f"scalar_{k}"], name=k)


def test_consistency_term(g):
    cons, _ = consistency_loss(
        _preds(g, "stu"), _preds(g, "tea"), _batch(g)["anchors"],
        _batch(g)["transformation"], _cfg(g).consistency)
    _close(cons, g["scalar_consistency_loss"], rtol=5e-4, name="consistency")


def test_teacher_ema_terms(g):
    total, m = detection_loss(
        _preds(g, "tea"), _batch(g), _cfg(g),
        labels_key="labels_raw", reg_targets_key="reg_targets_raw",
        include_odiou=False)
    _close(total, g["scalar_loss_ema"], name="loss_ema")
    for k in ("cls_loss_reduced", "loc_loss_reduced", "dir_loss_reduced",
              "iou_pred_loss"):
        _close(m[k], g[f"scalar_{k}_ema"], name=k + "_ema")


def test_gradients_wrt_student_preds(g):
    batch = _batch(g)
    cfg = _cfg(g)
    w = float(g["consistency_weight"])
    tea = _preds(g, "tea")

    def total_fn(box, cls, iou, dirp):
        preds = {"box_preds": box, "cls_preds": cls, "iou_preds": iou,
                 "dir_cls_preds": dirp}
        sup, _ = detection_loss(preds, batch, cfg)
        cons, _ = consistency_loss(preds, tea, batch["anchors"],
                                   batch["transformation"], cfg.consistency)
        return sup + w * cons

    grads = jax.grad(total_fn, argnums=(0, 1, 2, 3))(
        jnp.asarray(g["stu_box"]), jnp.asarray(g["stu_cls"]),
        jnp.asarray(g["stu_iou"]), jnp.asarray(g["stu_dir"]))
    for ours, key in zip(grads, ("grad_box", "grad_cls", "grad_iou",
                                 "grad_dir")):
        ref = g[key]
        ours = np.asarray(ours)
        # the IoU-pred targets are detached in both implementations; the
        # remaining gradient paths are smooth in general position. box
        # gradients carry the ODIoU MBR argmin-tie noise characterized in
        # test_odiou_ref_goldens (~0.05 per pair, here scaled by the
        # 1/num_pos reg weight and 2/batch => ~1e-3)
        atol = 2.5e-3 if key == "grad_box" else 1e-4
        bound = atol + 2e-3 * np.abs(ref)
        diff = np.abs(ours - ref)
        assert (diff <= bound).all(), (
            f"{key}: max excess {(diff - bound).max():.2e} at "
            f"{np.unravel_index((diff - bound).argmax(), diff.shape)} "
            f"(ours={ours.flat[(diff - bound).argmax()]:.6f}, "
            f"ref={ref.flat[(diff - bound).argmax()]:.6f})")
