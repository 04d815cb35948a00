"""Fused transposed serving plan (Pallas conv+affine+ReLU in [C, cols]
layout, interpret mode on CPU) and host-precomputed rulebooks must reproduce
the plain gather plan exactly — with NONTRIVIAL BN stats/params (a masked-BN
bias bug in r1 was invisible at init where bias=0)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sessd_tpu.models.backbone import SpMiddleFHD
from sessd_tpu.utils.native import get_native

SPARSE_SHAPE = (41, 32, 32)


def _scene(rng, b=1, v=300):
    d, h, w = SPARSE_SHAPE
    coords = np.stack(
        [rng.randint(0, b, b * v), rng.randint(0, d, b * v),
         rng.randint(0, h, b * v), rng.randint(0, w, b * v)], 1).astype(np.int32)
    feats = rng.randn(b * v, 4).astype(np.float32)
    valid = np.ones(b * v, bool)
    valid[-11:] = False
    return (jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid), b,
            SPARSE_SHAPE)


def _nontrivial_variables(rng, model, args):
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    # random BN stats + biases so affine folding is actually exercised
    def jitter(path, a):
        name = "/".join(str(p) for p in path)
        if "mean" in name or "bias" in name:
            return jnp.asarray(np.random.RandomState(len(name)).randn(
                *a.shape).astype(np.float32) * 0.3)
        if "var" in name:
            return jnp.asarray(np.random.RandomState(len(name)).rand(
                *a.shape).astype(np.float32) + 0.5)
        if "scale" in name:
            return jnp.asarray(1.0 + np.random.RandomState(len(name)).randn(
                *a.shape).astype(np.float32) * 0.2)
        return a
    return jax.tree_util.tree_map_with_path(jitter, variables)


def test_fused_plan_matches_gather(rng):
    args = _scene(rng)
    caps = (512, 512, 400, 256, 128)
    ref = SpMiddleFHD(stage_capacity=caps, dense_from_stage=5,
                      conv_impl="gather")
    variables = _nontrivial_variables(rng, ref, args)
    want = np.asarray(ref.apply(variables, *args, train=False))

    fused = SpMiddleFHD(stage_capacity=caps, dense_from_stage=5,
                        conv_impl="fused")
    got = np.asarray(fused.apply(variables, *args, train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_precomputed_rulebooks_match_device(rng):
    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")
    args = _scene(rng)
    feats, coords, valid, b, shape = args
    caps = (512, 512, 400, 256, 128)
    downs = [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
             ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
             ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
             ((3, 1, 1), (2, 1, 1), (0, 0, 0))]
    host = native.build_rulebooks(np.asarray(coords), np.asarray(valid),
                                  (b,) + shape, caps, downs)
    model = SpMiddleFHD(stage_capacity=caps, dense_from_stage=5,
                        conv_impl="gather")
    variables = _nontrivial_variables(rng, model, args)
    want = np.asarray(model.apply(variables, *args, train=False))
    got = np.asarray(model.apply(variables, *args, train=False,
                                 rulebooks=host))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # int16 rulebooks (the transfer-compressed form) upcast in-graph
    host16 = jax.tree_util.tree_map(lambda a: a.astype(np.int16), host)
    got16 = np.asarray(model.apply(variables, *args, train=False,
                                   rulebooks=host16))
    np.testing.assert_allclose(got16, want, atol=1e-5, rtol=1e-5)


def test_fused_with_precomputed_rulebooks(rng):
    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")
    args = _scene(rng)
    feats, coords, valid, b, shape = args
    caps = (512, 512, 400, 256, 128)
    downs = [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
             ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
             ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
             ((3, 1, 1), (2, 1, 1), (0, 0, 0))]
    host = native.build_rulebooks(np.asarray(coords), np.asarray(valid),
                                  (b,) + shape, caps, downs)
    gather = SpMiddleFHD(stage_capacity=caps, dense_from_stage=5,
                         conv_impl="gather")
    variables = _nontrivial_variables(rng, gather, args)
    want = np.asarray(gather.apply(variables, *args, train=False))
    fused = SpMiddleFHD(stage_capacity=caps, dense_from_stage=5,
                        conv_impl="fused")
    got = np.asarray(fused.apply(variables, *args, train=False,
                                 rulebooks=host))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_fused_plan_two_level_windows(rng):
    """Tiny small-windows force the in-kernel wide-block branch through the
    whole fused backbone; result must still equal the gather plan."""
    args = _scene(rng)
    caps = (512, 512, 400, 256, 128)
    ref = SpMiddleFHD(stage_capacity=caps, dense_from_stage=5,
                      conv_impl="gather")
    variables = _nontrivial_variables(rng, ref, args)
    want = np.asarray(ref.apply(variables, *args, train=False))

    fused = SpMiddleFHD(stage_capacity=caps, dense_from_stage=5,
                        conv_impl="fused",
                        subm_windows_small=(128, 128, 128, 128),
                        down_windows_small=(128, 128, 128, 128))
    got = np.asarray(fused.apply(variables, *args, train=False))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_fused_plan_block_override(rng):
    """Non-default pallas grid block (fused_block) stays exact."""
    args = _scene(rng)
    caps = (512, 512, 400, 256, 128)
    ref = SpMiddleFHD(stage_capacity=caps, dense_from_stage=5,
                      conv_impl="gather")
    variables = _nontrivial_variables(rng, ref, args)
    want = np.asarray(ref.apply(variables, *args, train=False))
    fused = SpMiddleFHD(stage_capacity=caps, dense_from_stage=5,
                        conv_impl="fused", fused_block=128)
    got = np.asarray(fused.apply(variables, *args, train=False))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)
