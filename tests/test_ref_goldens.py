"""Full-model numerical parity against the reference's own torch code.

tests/goldens/ref_full_model.npz was produced by scripts/make_torch_goldens.py:
the reference det3d VoxelNet (VFEv3 -> SpMiddleFHD -> SSFA -> MultiGroupHead,
built by the reference's builder from its config) ran on CPU with
deterministic weights (regenerated here from the stored (name, shape) list —
see tests/golden_utils.py) on a fixed cropped scene, with spconv replaced by
a dense oracle (the semantics our engine is equivalence-tested against).
This test pins reader -> backbone -> neck -> head -> decode + confidence
rectification end-to-end (the full inference stack up to NMS, which is
discrete selection over these exact inputs). VERDICT r1 item #2.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tests.golden_utils import reference_state_dict

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "ref_full_model.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def our_preds(golden):
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.utils.convert_torch import convert_state_dict

    sd = reference_state_dict(golden["sd_names"], golden["sd_shapes"])
    params, stats = convert_state_dict(sd)

    # cropped grid: x in [0, 17.6), y in [-8, 8) at 0.05m -> (41, 320, 352)
    model = VoxelNet(sparse_shape=(41, 320, 352))
    voxels = jnp.asarray(golden["voxels"])
    n = voxels.shape[0]
    coords = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), jnp.asarray(golden["coords_zyx"])], 1)
    num_points = jnp.asarray(golden["num_points"])
    valid = jnp.ones((n,), bool)
    preds = model.apply({"params": params, "batch_stats": stats},
                        voxels, coords, num_points, valid, 1, train=False)
    return preds[0]


def test_head_preds_match_reference(golden, our_preds):
    # head outputs pin the whole reader/backbone/neck/head stack
    for ours, theirs in [("box_preds", "box_preds"), ("cls_preds", "cls_preds"),
                         ("iou_preds", "iou_preds"),
                         ("dir_cls_preds", "dir_preds")]:
        ref = golden[theirs]  # [1, H, W, C] NHWC; ours is [1, A, c] flattened
        got = np.asarray(our_preds[ours])
        assert got.size == ref.size, (ours, got.shape, ref.shape)
        got = got.reshape(ref.shape[0], -1)
        ref = ref.reshape(ref.shape[0], -1)
        scale = np.abs(ref).max() + 1e-6
        err = np.abs(got - ref).max() / scale
        assert err < 2e-4, f"{ours}: rel err {err:.2e}"


def test_decode_and_rectification_match_reference(golden, our_preds):
    from sessd_tpu.core import box_jax

    anchors = jnp.asarray(golden["anchors"])
    box_flat = jnp.asarray(our_preds["box_preds"]).reshape(-1, 7)
    decoded = np.asarray(box_jax.second_box_decode(box_flat, anchors))
    ref = golden["decoded_boxes"]
    np.testing.assert_allclose(decoded, ref, rtol=1e-3, atol=2e-4)

    cls_flat = np.asarray(our_preds["cls_preds"]).reshape(-1)
    iou_flat = np.asarray(our_preds["iou_preds"]).reshape(-1)
    scores = 1.0 / (1.0 + np.exp(-cls_flat))
    rectified = scores * ((iou_flat + 1.0) * 0.5) ** 4
    np.testing.assert_allclose(rectified, golden["rectified_scores"],
                               rtol=1e-3, atol=1e-5)

    dir_flat = np.asarray(our_preds["dir_cls_preds"]).reshape(-1, 2)
    np.testing.assert_array_equal(np.argmax(dir_flat, -1),
                                  golden["dir_labels"])
