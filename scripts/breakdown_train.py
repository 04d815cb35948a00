"""Decompose the full-scale bf16+hostrb training step (~963 ms r2).

Times, on the real TPU (run alone):
  1. the full production step (teacher fwd + student fwd/bwd + losses +
     EMA + adam), dfs=2 hybrid backbone;
  2. the same at dense_from_stage 3 and 5 (all-sparse) — isolates the
     sparse-gather vs masked-dense split;
  3. forward-only student+teacher (no grad) — fwd/bwd ratio;
  4. a backbone-only step (loss = backbone BEV sum) fwd+bwd — how much of
     the step is the backbone vs neck/head/losses.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from train_ab import add_host_rulebooks, make_full_batch  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sessd_tpu.models import VoxelNet
    from sessd_tpu.train.losses import LossConfig
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import (_coords_with_batch,
                                            _squeeze_rulebooks,
                                            create_train_state,
                                            make_train_step)

    b = 4
    batch = make_full_batch(b=b)
    batch_rb = add_host_rulebooks(batch, b)
    opt = build_optimizer(OneCycleConfig(total_steps=1000))

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = create_train_state(
            VoxelNet(sparse_shape=(41, 1600, 1408), conv_impl="gather"),
            opt, jax.tree_util.tree_map(np.asarray, batch), batch_size=b)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    bd = jax.device_put(batch_rb, dev)

    def timeit(fn, *args, iters=8):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x).ravel()[:1], out)  # force readback
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
            d = (time.perf_counter() - t0) / iters
            best = d if best is None else min(best, d)
        return best * 1e3

    for dfs in (2, 3, 5):
        model = VoxelNet(sparse_shape=(41, 1600, 1408), dtype=jnp.bfloat16,
                         backbone_remat=False, dense_from_stage=dfs)
        step = jax.jit(make_train_step(model, opt, LossConfig(),
                                       compute_teacher_metrics=False))
        ms = timeit(lambda s: step(s, bd, jnp.float32(0.5))[1]["loss"], state)
        print(f"full step dfs={dfs}: {ms:.1f} ms", flush=True)

    model = VoxelNet(sparse_shape=(41, 1600, 1408), dtype=jnp.bfloat16,
                     backbone_remat=False, dense_from_stage=2)

    from sessd_tpu.train.train_step import _flatten_voxels

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd_only(variables, bd):
        stu = _flatten_voxels(bd)
        tea = _flatten_voxels(bd, "_raw")
        rb_s = _squeeze_rulebooks(bd.get("rulebooks"))
        rb_t = _squeeze_rulebooks(bd.get("rulebooks_raw"))
        p1 = model.apply(variables, *stu, b, train=True,
                         mutable=["batch_stats"], rulebooks=rb_s)
        p2 = model.apply(variables, *tea, b, train=True,
                         mutable=["batch_stats"], rulebooks=rb_t)
        return p1[0][0]["cls_preds"].sum() + p2[0][0]["cls_preds"].sum()

    print(f"fwd-only (stu+tea): {timeit(fwd_only, variables, bd):.1f} ms",
          flush=True)

    from sessd_tpu.models.backbone import SpMiddleFHD

    bb = SpMiddleFHD(dtype=jnp.bfloat16, remat=False, dense_from_stage=2)
    bparams = {"params": state.params["backbone"],
               "batch_stats": state.batch_stats["backbone"]}

    @jax.jit
    def backbone_step(bp, bd):
        stu = _flatten_voxels(bd)
        rb_s = _squeeze_rulebooks(bd.get("rulebooks"))
        feats = stu[0][:, :, :4].mean(axis=1)

        def loss_fn(p):
            out, _ = bb.apply({"params": p["params"],
                               "batch_stats": p["batch_stats"]},
                              feats, _coords_with_batch(bd["coords"]),
                              stu[3], b, (41, 1600, 1408), train=True,
                              mutable=["batch_stats"], rulebooks=rb_s)
            return (out.astype(jnp.float32) ** 2).mean()

        l, g = jax.value_and_grad(loss_fn)(bp)
        return l

    print(f"backbone-only fwd+bwd (student): "
          f"{timeit(backbone_step, bparams, bd):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
