"""Exact fallback on serving capacity saturation (serve.ExactBatchServer).

The tight SERVING_CAPS-style capacities are a throughput lever; a scene
denser than they were sized for saturates a stage's id table and the chain
silently TRUNCATES voxels — serving outputs would degrade with no error
(VERDICT r3 weak #3). The server must detect saturation host-side and
re-prep + re-run the batch at the dominating safe caps, producing
detections identical to a direct safe-caps run; sparse scenes must stay on
the fast path.
"""
import numpy as np
import pytest

from sessd_tpu.utils.native import get_native

pytestmark = pytest.mark.skipif(get_native() is None,
                                reason="needs the native toolchain")

# cropped grid (x in [0,17.6), y in [-8,8) at 0.05 m) -> (41, 320, 352);
# feature map 40x44
RANGE = (0.0, -8.0, -3.0, 17.6, 8.0, 1.0)
FAST_CAPS = (4000, 1000, 800, 500, 400)
SAFE_CAPS = (4000, 4000, 3000, 2000, 1500)


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from sessd_tpu.core.anchors import create_anchors_3d_range
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.models.predict import PredictConfig
    from sessd_tpu.ops.voxelize import VoxelizerSpec
    from sessd_tpu.serve import ExactBatchServer

    spec = VoxelizerSpec(RANGE, (0.05, 0.05, 0.1), max_points=5,
                         max_voxels=FAST_CAPS[0])
    model = VoxelNet(sparse_shape=spec.sparse_shape, conv_impl="gather",
                     dense_from_stage=5)
    anchors = jnp.asarray(create_anchors_3d_range(
        [1, 40, 44], [0.0, -8.0, -1.0, 17.6, 8.0, -1.0]).reshape(-1, 7))
    pcfg = PredictConfig(nms_pre_max_size=128, nms_post_max_size=16,
                         score_threshold=0.05)

    cap0 = FAST_CAPS[0]
    init_args = (np.zeros((cap0, 1, 4), np.float32),
                 np.zeros((cap0, 4), np.int32),
                 np.ones((cap0,), np.int32), np.zeros((cap0,), bool), 1)
    variables = model.init(jax.random.PRNGKey(0), *init_args, train=False)

    server = ExactBatchServer(model, variables, anchors, pcfg, spec,
                              serving_caps=FAST_CAPS, safe_caps=SAFE_CAPS)
    return spec, model, variables, anchors, pcfg, server


def _dense_scene(rng):
    """Random points filling the crop — saturates the downsampled stages."""
    n = 40000
    pts = np.stack([rng.uniform(0.2, 17.4, n), rng.uniform(-7.8, 7.8, n),
                    rng.uniform(-2.8, 0.8, n), rng.uniform(0, 1, n)],
                   axis=1).astype(np.float32)
    return pts


def _sparse_scene(rng):
    # a compact dense blob: strided convs DILATE isolated voxels (each
    # touches up to 8 k3s2 output sites), so scattered points would blow
    # past the downsampled-stage caps — a dense cluster shrinks ~8x per
    # stage instead and stays well under every cap
    n = 800
    pts = np.stack([rng.uniform(5.0, 6.2, n), rng.uniform(0.0, 1.0, n),
                    rng.uniform(-1.7, -1.3, n), rng.uniform(0, 1, n)],
                   axis=1).astype(np.float32)
    return pts


def test_dense_scene_saturates_fast_caps(setup):
    """Sharpness: the dense scene must actually saturate the fast chain —
    otherwise the fallback test below proves nothing."""
    from sessd_tpu.serve import saturated_stages

    spec, *_, server = setup
    pts = _dense_scene(np.random.RandomState(0))
    p = server.fast_prep(pts)
    sat = [i for i in saturated_stages(p["rulebooks"], server.fast_caps)
           if i in server._fixable]
    assert sat, "dense scene did not saturate any headroom stage"
    # and the truncation is real: the safe chain keeps more voxels
    p_safe = server.safe_prep(pts)
    sent = np.iinfo(np.int32).max
    for i in sat[:1]:
        n_fast = int((np.asarray(p["rulebooks"]["ids"][i]) < sent).sum())
        n_safe = int((np.asarray(p_safe["rulebooks"]["ids"][i]) < sent).sum())
        assert n_safe > n_fast, (i, n_fast, n_safe)


def test_saturated_batch_takes_exact_fallback(setup):
    """Server output on a saturating scene == a direct safe-caps run."""
    from sessd_tpu.serve import make_infer_fn

    spec, model, variables, anchors, pcfg, server = setup
    pts = _dense_scene(np.random.RandomState(0))

    boxes, scores, valid = (np.asarray(a) for a in server([pts]))
    assert server.stats["exact_fallback"] == 1

    p = server.safe_prep(pts)
    direct = make_infer_fn(model.clone(stage_capacity=SAFE_CAPS), variables,
                           anchors, pcfg, list(SAFE_CAPS))
    d_boxes, d_scores, d_valid = (np.asarray(a)
                                  for a in direct(variables, p["feats"],
                                                  p["rulebooks"]))
    np.testing.assert_array_equal(valid, d_valid)
    np.testing.assert_allclose(boxes[valid], d_boxes[d_valid], atol=1e-5)
    np.testing.assert_allclose(scores[valid], d_scores[d_valid], atol=1e-6)


def test_sparse_batch_stays_on_fast_path(setup):
    spec, model, variables, anchors, pcfg, server = setup
    before = dict(server.stats)
    pts = _sparse_scene(np.random.RandomState(1))
    boxes, scores, valid = (np.asarray(a) for a in server([pts]))
    assert server.stats["fast"] == before["fast"] + 1
    assert server.stats["exact_fallback"] == before["exact_fallback"]
    assert valid.shape[0] == 1  # batch dim present


def test_safe_caps_must_dominate(setup):
    from sessd_tpu.serve import ExactBatchServer

    spec, model, variables, anchors, pcfg, _ = setup
    with pytest.raises(ValueError):
        ExactBatchServer(model, variables, anchors, pcfg, spec,
                         serving_caps=FAST_CAPS,
                         safe_caps=(4000, 900, 3000, 2000, 1500))
