"""Golden tests of the elementary losses against independently-written torch
formulations (the reference's loss semantics, losses.py:147-531)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_smooth_l1_sigma3_matches_torch(rng):
    import jax.numpy as jnp
    from sessd_tpu.train.losses import smooth_l1

    diff = rng.randn(1000).astype(np.float32) * 0.5
    got = np.asarray(smooth_l1(jnp.asarray(diff), sigma=3.0))
    # reference formulation: 0.5*(sigma*x)^2 if |x| <= 1/sigma^2 else |x| - 0.5/sigma^2
    x = torch.from_numpy(diff)
    s2 = 9.0
    want = torch.where(x.abs() <= 1 / s2, 0.5 * s2 * x * x, x.abs() - 0.5 / s2)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-6)


def test_sigmoid_focal_matches_torch(rng):
    import jax.numpy as jnp
    from sessd_tpu.train.losses import sigmoid_focal_loss

    logits = rng.randn(500, 1).astype(np.float32) * 3
    targets = (rng.rand(500, 1) > 0.8).astype(np.float32)
    w = rng.rand(500).astype(np.float32)
    got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                                        jnp.asarray(w), alpha=0.25, gamma=2.0))

    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(targets)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p = torch.sigmoid(lt)
    p_t = tt * p + (1 - tt) * (1 - p)
    aw = tt * 0.25 + (1 - tt) * 0.75
    want = ((1 - p_t) ** 2 * aw * ce) * torch.from_numpy(w)[:, None]
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


def test_softmax_ce_matches_torch(rng):
    import jax.numpy as jnp
    from sessd_tpu.train.losses import softmax_ce_loss

    logits = rng.randn(300, 2).astype(np.float32)
    labels = rng.randint(0, 2, 300)
    onehot = np.eye(2, dtype=np.float32)[labels]
    w = rng.rand(300).astype(np.float32)
    got = np.asarray(softmax_ce_loss(jnp.asarray(logits), jnp.asarray(onehot),
                                     jnp.asarray(w)))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), reduction="none"
    ).numpy() * w
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_prepare_loss_weights_normalization(rng):
    import jax.numpy as jnp
    from sessd_tpu.train.losses import prepare_loss_weights

    labels = np.zeros((2, 100), np.int32)
    labels[0, :10] = 1   # 10 positives
    labels[0, 10:20] = -1  # don't care
    labels[1, :4] = 1
    cls_w, reg_w, cared = prepare_loss_weights(jnp.asarray(labels))
    cls_w, reg_w, cared = map(np.asarray, (cls_w, reg_w, cared))
    # reg weights: 1/num_pos on positives
    np.testing.assert_allclose(reg_w[0, :10], 0.1, atol=1e-6)
    np.testing.assert_allclose(reg_w[1, :4], 0.25, atol=1e-6)
    assert reg_w[0, 10:].sum() == 0
    # cls weights: (pos+neg)/num_pos, zero on don't-care
    np.testing.assert_allclose(cls_w[0, 0], 0.1, atol=1e-6)
    np.testing.assert_allclose(cls_w[0, 25], 0.1, atol=1e-6)
    assert cls_w[0, 10:20].sum() == 0
    assert not cared[0, 10:20].any()


def test_direction_target(rng):
    import jax.numpy as jnp
    from sessd_tpu.train.losses import get_direction_target

    anchors = np.zeros((1, 4, 7), np.float32)
    anchors[0, :, 6] = [0.0, np.pi / 2, 0.0, 0.0]
    reg = np.zeros((1, 4, 7), np.float32)
    reg[0, :, 6] = [0.5, -2.0, -0.5, 0.0]  # rot_gt = .5, -.43, -.5, 0
    t = np.asarray(get_direction_target(jnp.asarray(anchors), jnp.asarray(reg)))
    np.testing.assert_array_equal(t[0, :, 1], [1, 0, 0, 0])  # >0 -> class 1
