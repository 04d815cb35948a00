"""Fine decomposition of the CURRENT full-scale training step (dfs=3,
bf16, host rulebooks, B=4) + teacher-plan A/Bs (VERDICT r3 item 3).

Measures, on the real TPU (run alone):
  1. the full production step at the builder default (student dfs=3);
  2. teacher-plan splits: teacher at dfs=5 / teacher conv_impl=pallas /
     both-pallas — the teacher forward is inference-shaped, so it may run
     a cheaper plan than the student (train_step.make_train_step
     teacher_model=);
  3. isolated terms at dfs=3: teacher fwd alone, student fwd alone,
     fwd+bwd(losses) alone, losses-only grad on fixed head preds,
     optimizer+EMA alone — where the 585 ms actually goes.
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
    from sessd_tpu.train.losses import (LossConfig, consistency_loss,
                                        detection_loss)
    from sessd_tpu.train.optim import OneCycleConfig, build_optimizer
    from sessd_tpu.train.train_step import (_flatten_voxels,
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
        jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
            d = (time.perf_counter() - t0) / iters
            best = d if best is None else min(best, d)
        return best * 1e3

    def mk(**kw):
        return VoxelNet(sparse_shape=(41, 1600, 1408), dtype=jnp.bfloat16,
                        backbone_remat=False, **kw)

    student = mk(dense_from_stage=3)

    # --- 1+2: full step, teacher-plan A/B ---------------------------------
    variants = [
        ("default (tea=stu dfs=3)", None),
        ("tea dfs=5", mk(dense_from_stage=5)),
        ("tea dfs=3 pallas", mk(dense_from_stage=3, conv_impl="pallas")),
        ("tea dfs=5 pallas", mk(dense_from_stage=5, conv_impl="pallas")),
    ]
    for name, tea in variants:
        step = jax.jit(make_train_step(student, opt, LossConfig(),
                                       compute_teacher_metrics=False,
                                       teacher_model=tea))
        ms = timeit(lambda s: step(s, bd, jnp.float32(0.5))[1]["loss"], state)
        print(f"full step [{name}]: {ms:.1f} ms", flush=True)

    # student-pallas A/B (grads flow through the custom_vjp wconv)
    stu_p = mk(dense_from_stage=3, conv_impl="pallas")
    step = jax.jit(make_train_step(stu_p, opt, LossConfig(),
                                   compute_teacher_metrics=False))
    ms = timeit(lambda s: step(s, bd, jnp.float32(0.5))[1]["loss"], state)
    print(f"full step [stu+tea pallas dfs=3]: {ms:.1f} ms", flush=True)

    # --- 3: isolated terms at the default plan ----------------------------
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def tea_fwd(variables, bd):
        tea = _flatten_voxels(bd, "_raw")
        rb_t = _squeeze_rulebooks(bd.get("rulebooks_raw"))
        p = student.apply(variables, *tea, b, train=True,
                          mutable=["batch_stats"], rulebooks=rb_t)
        return p[0][0]["cls_preds"].sum()

    print(f"teacher fwd alone (dfs=3): {timeit(tea_fwd, variables, bd):.1f} ms",
          flush=True)

    tea5 = mk(dense_from_stage=5)

    @jax.jit
    def tea_fwd5(variables, bd):
        tea = _flatten_voxels(bd, "_raw")
        rb_t = _squeeze_rulebooks(bd.get("rulebooks_raw"))
        p = tea5.apply(variables, *tea, b, train=True,
                       mutable=["batch_stats"], rulebooks=rb_t)
        return p[0][0]["cls_preds"].sum()

    print(f"teacher fwd alone (dfs=5): {timeit(tea_fwd5, variables, bd):.1f} ms",
          flush=True)

    @jax.jit
    def stu_fwd(variables, bd):
        stu = _flatten_voxels(bd)
        rb_s = _squeeze_rulebooks(bd.get("rulebooks"))
        p = student.apply(variables, *stu, b, train=True,
                          mutable=["batch_stats"], rulebooks=rb_s)
        return p[0][0]["cls_preds"].sum()

    print(f"student fwd alone (dfs=3): {timeit(stu_fwd, variables, bd):.1f} ms",
          flush=True)

    # student fwd+bwd with the full loss, teacher preds precomputed (frozen)
    lcfg = LossConfig()

    @jax.jit
    def tea_preds_fn(variables, bd):
        tea = _flatten_voxels(bd, "_raw")
        rb_t = _squeeze_rulebooks(bd.get("rulebooks_raw"))
        p = student.apply(variables, *tea, b, train=True,
                          mutable=["batch_stats"], rulebooks=rb_t)
        return p[0][0]

    preds_tea = jax.block_until_ready(tea_preds_fn(variables, bd))

    @jax.jit
    def stu_fwd_bwd(params, bd, preds_tea):
        stu = _flatten_voxels(bd)
        rb_s = _squeeze_rulebooks(bd.get("rulebooks"))

        def loss_fn(p):
            preds, _ = student.apply(
                {"params": p, "batch_stats": state.batch_stats}, *stu, b,
                train=True, mutable=["batch_stats"], rulebooks=rb_s)
            sup, _m = detection_loss(preds[0], bd, lcfg)
            cons, _d = consistency_loss(preds[0], preds_tea, bd["anchors"],
                                        bd["transformation"],
                                        lcfg.consistency)
            return sup + 0.5 * cons

        l, g = jax.value_and_grad(loss_fn)(params)
        return l

    print(f"student fwd+bwd+losses (dfs=3): "
          f"{timeit(stu_fwd_bwd, state.params, bd, preds_tea):.1f} ms",
          flush=True)

    # losses-only grad wrt the head preds (how much of bwd is loss math)
    preds_stu = jax.block_until_ready(jax.jit(
        lambda v, bd: student.apply(
            v, *_flatten_voxels(bd), b, train=True, mutable=["batch_stats"],
            rulebooks=_squeeze_rulebooks(bd.get("rulebooks")))[0][0]
    )(variables, bd))

    @jax.jit
    def losses_only(preds_stu, bd, preds_tea):
        def loss_fn(p):
            sup, _m = detection_loss(p, bd, lcfg)
            cons, _d = consistency_loss(p, preds_tea, bd["anchors"],
                                        bd["transformation"],
                                        lcfg.consistency)
            return sup + 0.5 * cons

        l, g = jax.value_and_grad(loss_fn)(preds_stu)
        return l

    print(f"losses-only grad (head preds fixed): "
          f"{timeit(losses_only, preds_stu, bd, preds_tea):.1f} ms",
          flush=True)

    # optimizer + EMA alone
    import optax

    @jax.jit
    def opt_ema(state):
        grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
        updates, _ = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        ema = jax.tree_util.tree_map(lambda e, p: 0.999 * e + 0.001 * p,
                                     state.ema_params, new_params)
        return jax.tree_util.tree_map(lambda x: x.ravel()[0], ema)

    print(f"optimizer+EMA alone: {timeit(opt_ema, state):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
