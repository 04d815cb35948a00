"""Decompose the serving forward's 67 ms: voxelize / rulebooks / convs / rest.

Times each segment as its own jit with pipelined submission + one readback
(CLAUDE.md: only trust in-process A/B readback timings through axon).
Run serially with nothing else on the TPU.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sessd_tpu.ops import sparse as sp
    from sessd_tpu.ops.pallas.wconv import windowed_conv
    from sessd_tpu.ops.voxelize import KITTI_VOXELIZER, voxelize_jax
    from sessd_tpu.utils.synth_scene import make_scene

    spec = KITTI_VOXELIZER
    d, h, w = spec.sparse_shape
    points = jnp.asarray(make_scene(seed=0)[0])
    caps = (20000, 22000, 18000, 12000, 8000)
    dtype = jnp.bfloat16

    # stage geometry mirroring SpMiddleFHD
    downs = [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (0, 1, 1)),
        ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
    ]
    def voxelize(pts):
        voxels, coords_zyx, num_points, _ = voxelize_jax(pts, spec)
        bidx = jnp.zeros((spec.max_voxels, 1), jnp.int32)
        coords = jnp.concatenate([bidx, coords_zyx], axis=1)
        valid = coords_zyx[:, 0] >= 0
        feats = (jnp.sum(voxels[:, :, :4], axis=1)
                 / jnp.maximum(num_points, 1).astype(jnp.float32)[:, None])
        return feats.astype(dtype), coords, valid

    def rulebooks(pts):
        feats, coords, valid = voxelize(pts)
        grid, perm = sp.grid_from_coords(coords, valid, (1, d, h, w), caps[0])
        x = feats[perm]
        x = jnp.where(grid.mask[:, None], x, 0.0)
        out = {"x": x, "masks": [], "subm": [], "down": []}
        for stage in range(5):
            if stage > 0:
                dk, ds, dp = downs[stage - 1]
                grid, rbd = sp.downsample_rulebook(grid, dk, ds, dp, caps[stage])
                out["down"].append(rbd)
                out["masks"].append(grid.mask)
            if stage < 4:
                out["subm"].append(sp.subm_rulebook(grid))
                if stage == 0:
                    out["mask0"] = grid.mask
        return out

    kshapes = [27, 27, 27, 27, 3]

    def convs(rb, impl):
        x = rb["x"]
        masks = rb["masks"]

        def one(x, r, m, cin, cout, k, window):
            kw = jax.random.normal(jax.random.PRNGKey(0), (k, cin, cout),
                                   jnp.float32).astype(dtype) * 0.05
            if impl == "pallas":
                return windowed_conv(x, r, kw, m, window=window)
            return sp.sparse_conv_apply(x, r, kw, m)

        plan_ch = [(4, 16), (16, 16)]
        for cin, cout in plan_ch:
            x = one(x, rb["subm"][0], rb["mask0"], cin, cout, 27, 768)
        stage_ch = [(16, 32, 2), (32, 64, 3), (64, 64, 3), (64, 64, 0)]
        for i, (cin, cout, nsub) in enumerate(stage_ch):
            k = kshapes[i + 1]
            x = one(x, rb["down"][i], masks[i], cin, cout, k, 2048)
            for _ in range(nsub):
                x = one(x, rb["subm"][i + 1], masks[i], cout, cout, 27, 768)
        return jnp.sum(x.astype(jnp.float32))

    def readback(out):
        # one-element readback forces completion without bulk transfers
        # (outputs of one jit program complete together)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(jnp.ravel(leaf)[0]))

    def timeit(fn, *args, iters=20):
        readback(fn(*args))
        for _ in range(3):
            out = fn(*args)
        readback(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        readback(out)
        return (time.perf_counter() - t0) / iters * 1e3

    def grid_only(pts):
        feats, coords, valid = voxelize(pts)
        grid, perm = sp.grid_from_coords(coords, valid, (1, d, h, w), caps[0])
        return grid.ids

    def down_chain(pts):
        feats, coords, valid = voxelize(pts)
        grid, perm = sp.grid_from_coords(coords, valid, (1, d, h, w), caps[0])
        out = []
        for stage in range(1, 5):
            dk, ds, dp = downs[stage - 1]
            grid, rbd = sp.downsample_rulebook(grid, dk, ds, dp, caps[stage])
            out.append(rbd)
        return out

    def subm_only(pts):
        feats, coords, valid = voxelize(pts)
        grid, perm = sp.grid_from_coords(coords, valid, (1, d, h, w), caps[0])
        out = [sp.subm_rulebook(grid)]
        for stage in range(1, 4):
            dk, ds, dp = downs[stage - 1]
            grid, rbd = sp.downsample_rulebook(grid, dk, ds, dp, caps[stage])
            out.append(sp.subm_rulebook(grid))
        return out

    vox_j = jax.jit(voxelize)
    grid_j = jax.jit(grid_only)
    down_j = jax.jit(down_chain)
    subm_j = jax.jit(subm_only)
    rb_j = jax.jit(rulebooks)
    convs_p = jax.jit(lambda rb: convs(rb, "pallas"))
    convs_g = jax.jit(lambda rb: convs(rb, "gather"))
    full_p = jax.jit(lambda pts: convs(rulebooks(pts), "pallas"))

    print(f"voxelize+vfe          : {timeit(vox_j, points):7.2f} ms")
    print(f"  +grid_from_coords   : {timeit(grid_j, points):7.2f} ms")
    print(f"  +4 downsample rb    : {timeit(down_j, points):7.2f} ms")
    print(f"  +4 subm rb (no down): {timeit(subm_j, points):7.2f} ms")
    print(f"voxelize+all rulebooks: {timeit(rb_j, points):7.2f} ms")
    rb_dev = jax.device_put(jax.tree_util.tree_map(np.asarray, rb_j(points)))
    print(f"convs pallas (given)  : {timeit(convs_p, rb_dev):7.2f} ms")
    print(f"convs gather (given)  : {timeit(convs_g, rb_dev):7.2f} ms")
    print(f"vox+rb+convs pallas   : {timeit(full_p, points):7.2f} ms")


if __name__ == "__main__":
    main()
