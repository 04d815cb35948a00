"""Wire-compression (pack_batch/unpack_batch) exactness tests.

The trainer ships train batches through pack_batch (sparse reg_targets,
int8 labels, f16 voxels, int16 coords); unpack_batch reconstructs them
inside the jitted step. Everything except the documented f16 voxel
quantization must round-trip EXACTLY.
"""
import numpy as np


def _fake_batch(rng, b=2, v=64, a=512, with_raw=True):
    out = {}
    for sfx in ([""] + (["_raw"] if with_raw else [])):
        labels = np.zeros((b, a), np.int32)
        # positives, negatives and don't-cares
        for i in range(b):
            pos = rng.choice(a, 5 + i, replace=False)
            labels[i, pos] = 1
            labels[i, (pos + 7) % a] = -1
        rt = np.zeros((b, a, 7), np.float32)
        rt[labels > 0] = rng.randn((labels > 0).sum(), 7).astype(np.float32)
        out.update({
            f"labels{sfx}": labels,
            f"reg_targets{sfx}": rt,
            f"voxels{sfx}": rng.randn(b, v, 5, 4).astype(np.float32) * 30,
            f"coords{sfx}": rng.randint(0, 1500, (b, v, 3)).astype(np.int32),
            f"num_points{sfx}": rng.randint(1, 6, (b, v)).astype(np.int32),
            f"voxel_mask{sfx}": np.ones((b, v), bool),
        })
    return out


def test_pack_unpack_roundtrip_exact(rng):
    import jax

    from sessd_tpu.train.train_step import pack_batch, unpack_batch

    batch = _fake_batch(rng)
    packed = pack_batch(batch)
    # wire sizes actually shrink
    assert packed["labels"].dtype == np.int8
    assert packed["voxels"].dtype == np.float16
    assert packed["coords"].dtype == np.int16
    assert "reg_targets" not in packed and "reg_targets_idx" in packed
    assert "reg_targets_raw_idx" in packed

    got = jax.device_get(unpack_batch(
        {k: np.asarray(v) for k, v in packed.items()}))
    for sfx in ("", "_raw"):
        np.testing.assert_array_equal(got["labels" + sfx],
                                      batch["labels" + sfx])
        np.testing.assert_array_equal(got["reg_targets" + sfx],
                                      batch["reg_targets" + sfx])
        np.testing.assert_array_equal(got["coords" + sfx],
                                      batch["coords" + sfx])
        np.testing.assert_array_equal(got["num_points" + sfx],
                                      batch["num_points" + sfx])
        # voxels: exact up to the documented f16 quantization
        np.testing.assert_array_equal(
            got["voxels" + sfx],
            batch["voxels" + sfx].astype(np.float16).astype(np.float32))
        assert got["labels" + sfx].dtype == np.int32
        assert got["reg_targets" + sfx].dtype == np.float32


def test_pack_dense_fallback_when_over_cap(rng):
    from sessd_tpu.train.train_step import pack_batch

    batch = _fake_batch(rng, with_raw=False)
    batch["labels"][0, :] = 1  # 512 positives > tiny cap
    packed = pack_batch(batch, pos_cap=16)
    # exactness first: reg_targets stay dense for the over-cap chain
    assert "reg_targets" in packed and "reg_targets_idx" not in packed
    assert packed["labels"].dtype == np.int8  # other fields still shrink


def test_pack_handles_anchor_zero_positive(rng):
    """A positive at anchor index 0 must survive packing (OOB padding, not
    zero padding, marks unused slots)."""
    import jax

    from sessd_tpu.train.train_step import pack_batch, unpack_batch

    batch = _fake_batch(rng, with_raw=False)
    batch["labels"][:, :] = 0
    batch["labels"][0, 0] = 1
    batch["reg_targets"][:] = 0
    batch["reg_targets"][0, 0] = np.arange(7, dtype=np.float32) + 1
    got = jax.device_get(unpack_batch(
        {k: np.asarray(v) for k, v in pack_batch(batch).items()}))
    np.testing.assert_array_equal(got["reg_targets"][0, 0],
                                  np.arange(7, dtype=np.float32) + 1)
    assert np.all(got["reg_targets"][0, 1:] == 0)
    assert np.all(got["reg_targets"][1] == 0)
