#!/usr/bin/env python
"""FLOPs of one forward pass via XLA cost analysis (tools/get_flops.py
equivalent; replaces det3d/utils/flops_counter.py's module hooks)."""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--voxels", type=int, default=16000)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from sessd_tpu import builder
    from sessd_tpu.config import Config
    from sessd_tpu.utils.flops import count_model_flops

    cfg = Config.fromfile(args.config)
    model = builder.build_detector(cfg)
    vox = builder.build_voxelizer(cfg.voxel_generator)
    d, h, w = vox.sparse_shape

    rng = np.random.RandomState(0)
    n = args.batch * args.voxels
    voxels = jnp.asarray(rng.randn(n, vox.max_points, 4).astype(np.float32))
    coords = jnp.asarray(np.stack(
        [rng.randint(0, args.batch, n), rng.randint(0, d, n),
         rng.randint(0, h, n), rng.randint(0, w, n)], 1).astype(np.int32))
    num_points = jnp.asarray(rng.randint(1, vox.max_points + 1, n).astype(np.int32))
    valid = jnp.ones(n, dtype=bool)

    variables = model.init(jax.random.PRNGKey(0), voxels, coords, num_points,
                           valid, args.batch, train=False)
    out = count_model_flops(model, variables, voxels, coords, num_points,
                            valid, args.batch, train=False)
    nparams = sum(np.prod(np.shape(p)) for p in
                  jax.tree_util.tree_leaves(variables["params"]))
    print(f"params: {nparams / 1e6:.2f} M")
    print(f"forward: {out['gflops']:.2f} GFLOPs, "
          f"{out['bytes_accessed'] / 1e9:.2f} GB accessed")


if __name__ == "__main__":
    main()
