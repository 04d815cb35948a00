"""Time the real SpMiddleFHD flax module alone (bench inputs, TPU),
to reconcile the standalone conv3d anomaly with the 90ms full forward."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from sessd_tpu.models.backbone import SpMiddleFHD
from sessd_tpu.models.vfe import VoxelFeatureExtractorV3
from sessd_tpu.ops.voxelize import KITTI_VOXELIZER, voxelize_jax
from sessd_tpu.utils.synth_scene import make_scene

spec = KITTI_VOXELIZER
sparse_shape = spec.sparse_shape
pts, _ = make_scene(0)

voxels, coords_zyx, num_points, _ = jax.jit(
    lambda p: voxelize_jax(p, spec))(jnp.asarray(pts))
coords = jnp.concatenate(
    [jnp.zeros((spec.max_voxels, 1), jnp.int32), coords_zyx], 1)
valid = coords_zyx[:, 0] >= 0
vfe = jax.jit(lambda v, n: VoxelFeatureExtractorV3().apply({}, v, n))(
    voxels, num_points)

for dt_ in (jnp.bfloat16, jnp.float32):
    tag = "bf16" if dt_ == jnp.bfloat16 else "f32"
    model = SpMiddleFHD(dtype=dt_, dense_from_stage=2)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), *jax.device_put(
                (vfe, coords, valid), cpu), 1, sparse_shape, train=False)
    variables = jax.device_put(
        jax.tree_util.tree_map(np.asarray, variables), jax.devices()[0])

    fn = jax.jit(lambda v, x, c, m: model.apply(v, x, c, m, 1, sparse_shape,
                                                train=False))
    out = fn(variables, vfe, coords, valid)
    _ = float(np.asarray(out[0, 0, 0, 0]))
    REPS = 30
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(variables, vfe, coords, valid)
    _ = float(np.asarray(out[0, 0, 0, 0]))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"backbone dfs=2 {tag}: {dt:.2f} ms")
