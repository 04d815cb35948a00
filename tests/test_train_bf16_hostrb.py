"""bf16-compute training (VERDICT r1 #7 / P44) and loader-built host
rulebooks in the train step (VERDICT r1 #4): both must train — bf16 losses
finite and decreasing with f32 parameters, and a step fed host rulebooks
must match the device-rulebook step exactly."""
import numpy as np
import pytest


@pytest.mark.slow
def test_bf16_training_overfits(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.train.losses import ConsistencyConfig, LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import create_train_state, make_train_step

    from test_train_step import make_batch

    batch = make_batch(rng, b=2, v=64)
    # bf16 COMPUTE (dtype), f32 parameters/optimizer — the reference's fp16
    # hook equivalent (det3d/core/fp16/hooks.py), no loss scaling needed in
    # bf16 (same exponent range as f32)
    model = VoxelNet(sparse_shape=(41, 32, 32), stage_capacity=(128,) * 5,
                     dtype=jnp.bfloat16)
    opt = build_optimizer(OneCycleConfig(lr_max=3e-3, total_steps=10000,
                                         pct_start=0.01))
    state = create_train_state(model, opt, batch, batch_size=2)
    # params stayed f32
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    cfg = LossConfig(max_positive_anchors=8,
                     consistency=ConsistencyConfig(top_k=8))
    step = jax.jit(make_train_step(model, opt, cfg,
                                   compute_teacher_metrics=False))
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch, jnp.float32(0.0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.75 * np.mean(losses[:5]), losses


def _dedupe(coords, mask):
    # random coords can collide; host and device resolve duplicate voxel
    # ids differently (first-match vs last-scatter), and real voxelizers
    # never emit duplicates — mask them out so both paths see one voxel/site
    import jax.numpy as jnp

    coords, mask = np.asarray(coords).copy(), np.asarray(mask).copy()
    for bi in range(coords.shape[0]):
        seen = set()
        for vi in range(coords.shape[1]):
            key = tuple(coords[bi, vi])
            if key in seen:
                mask[bi, vi] = False
            seen.add(key)
    return jnp.asarray(mask)


def _deduped_batch(rng, b, v):
    from test_train_step import make_batch

    batch = make_batch(rng, b=b, v=v)
    return dict(batch,
                voxel_mask=_dedupe(batch["coords"], batch["voxel_mask"]),
                voxel_mask_raw=_dedupe(batch["coords_raw"],
                                       batch["voxel_mask_raw"]))


def test_host_rulebooks_in_train_step(rng):
    import jax
    import jax.numpy as jnp
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.train.losses import ConsistencyConfig, LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import (_coords_with_batch,
                                            create_train_state,
                                            make_train_step)
    from sessd_tpu.utils.native import get_native

    native = get_native()
    if native is None:
        pytest.skip("no native toolchain")

    b, v = 2, 64
    caps = (128,) * 5
    sparse_shape = (41, 32, 32)
    batch = _deduped_batch(rng, b=b, v=v)
    model = VoxelNet(sparse_shape=sparse_shape, stage_capacity=caps)
    opt = build_optimizer(OneCycleConfig(total_steps=100))
    state = create_train_state(model, opt, batch, batch_size=b)
    cfg = LossConfig(max_positive_anchors=8,
                     consistency=ConsistencyConfig(top_k=8))
    step = jax.jit(make_train_step(model, opt, cfg,
                                   compute_teacher_metrics=False))
    _, metrics_dev = step(state, batch, jnp.float32(0.3))

    downs = [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
             ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
             ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
             ((3, 1, 1), (2, 1, 1), (0, 0, 0))]
    total_caps = [c * b for c in caps]

    def host_rb(suffix):
        coords = np.asarray(_coords_with_batch(
            jnp.asarray(batch["coords" + suffix])))
        valid = np.asarray(batch["voxel_mask" + suffix]).reshape(-1)
        return native.build_rulebooks(coords, valid, (b,) + sparse_shape,
                                      total_caps, downs)

    batch_rb = dict(batch, rulebooks=host_rb(""), rulebooks_raw=host_rb("_raw"))
    step_rb = jax.jit(make_train_step(model, opt, cfg,
                                      compute_teacher_metrics=False))
    _, metrics_host = step_rb(state, batch_rb, jnp.float32(0.3))
    np.testing.assert_allclose(float(metrics_host["loss"]),
                               float(metrics_dev["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(metrics_host["grad_norm"]),
                               float(metrics_dev["grad_norm"]), rtol=1e-4)


def test_loader_rulebook_transform_sharded(rng):
    """The loader-side transform (data/rulebooks.py, stacked per-shard
    chains) through the SHARDED step must match the sharded step that
    builds rulebooks on device — i.e. the production multi-chip training
    topology with host C++ rulebooks is numerics-identical."""
    import jax
    import jax.numpy as jnp
    from sessd_tpu.data.rulebooks import make_train_rulebook_transform
    from sessd_tpu.models import VoxelNet
    from sessd_tpu.parallel.mesh import (DATA_AXIS, make_mesh,
                                         make_sharded_train_step, replicate,
                                         shard_batch)
    from sessd_tpu.train.losses import ConsistencyConfig, LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import create_train_state, make_train_step

    n_shards = 4
    b, v = n_shards, 64
    caps = (128,) * 5
    sparse_shape = (41, 32, 32)
    transform = make_train_rulebook_transform(sparse_shape, caps,
                                              num_shards=n_shards)
    if transform is None:
        pytest.skip("no native toolchain")

    batch = _deduped_batch(rng, b=b, v=v)
    batch_np = jax.tree_util.tree_map(np.asarray, batch)
    batch_rb = transform(dict(batch_np))
    assert batch_rb["rulebooks"]["perm"].shape == (n_shards, caps[0])
    assert batch_rb["rulebooks"]["subm"][0].shape == (n_shards, caps[0], 27)

    model = VoxelNet(sparse_shape=sparse_shape, stage_capacity=caps,
                     axis_name=DATA_AXIS)
    opt = build_optimizer(OneCycleConfig(total_steps=100))
    state = create_train_state(
        VoxelNet(sparse_shape=sparse_shape, stage_capacity=caps), opt,
        batch, batch_size=b)
    cfg = LossConfig(max_positive_anchors=8,
                     consistency=ConsistencyConfig(top_k=8))
    mesh = make_mesh(jax.devices()[:n_shards])
    step = make_sharded_train_step(
        make_train_step(model, opt, cfg, compute_teacher_metrics=False,
                        axis_name=DATA_AXIS), mesh)
    state_r = replicate(state, mesh)

    _, m_dev = step(state_r, shard_batch(batch_np, mesh), jnp.float32(0.3))
    _, m_host = step(state_r, shard_batch(batch_rb, mesh), jnp.float32(0.3))
    np.testing.assert_allclose(float(m_host["loss"]), float(m_dev["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_host["grad_norm"]),
                               float(m_dev["grad_norm"]), rtol=1e-4)


def test_loader_applies_batch_transform():
    """DataLoader runs batch_transform in the prefetch path."""
    from sessd_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 6

        def get_sensor_data(self, idx, rng=None):
            return {"x": np.full((3,), idx, np.float32)}

    calls = []

    def tf(batch):
        calls.append(batch["x"].shape)
        return dict(batch, extra=batch["x"].sum())

    dl = DataLoader(DS(), batch_size=2, shuffle=False, num_workers=2,
                    batch_transform=tf)
    batches = list(dl)
    assert len(batches) == 3 and all("extra" in b for b in batches)
    assert calls and all(s == (2, 3) for s in calls)
