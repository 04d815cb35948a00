"""Warm-start optimizer semantics (load_checkpoint_from_scratch,
/root/reference/det3d/torchie/trainer/trainer_sessd.py:212-217): the
reference restores per-param Adam state via optimizer.load_state_dict but
its LR comes from a scheduler stepped by the trainer's global_step, which
restarts at 0. The optax equivalent must therefore keep the Adam moments
(and their bias-correction counts) while resetting every schedule count —
otherwise a warm-started one-cycle resumes thousands of steps into (or
past) its anneal at lr ~ lr_max/div/1e4 and the SE-SSD stage learns
nothing."""
import numpy as np
import optax


def test_restart_schedule_keeps_moments_resets_schedule(rng):
    import jax.numpy as jnp

    from sessd_tpu.train.optim import (OneCycleConfig, build_optimizer,
                                       one_cycle_lr, one_cycle_mom)
    from sessd_tpu.utils.checkpoint import _restart_schedule

    params = {"w": jnp.ones((4,))}
    opt_a = build_optimizer(OneCycleConfig(lr_max=3e-3, total_steps=100))
    st = opt_a.init(params)
    g = {"w": jnp.full((4,), 0.1)}
    for _ in range(50):
        up, st = opt_a.update(g, st, params)
        params = optax.apply_updates(params, up)
    mu_before = np.asarray(st[1].inner_state[0].mu["w"])
    adam_count = int(st[1].inner_state[0].count)
    assert adam_count == 50

    st2 = _restart_schedule(st)
    # Adam moments + inner count preserved (torch restores per-param step)
    np.testing.assert_allclose(np.asarray(st2[1].inner_state[0].mu["w"]),
                               mu_before)
    assert int(st2[1].inner_state[0].count) == adam_count

    # the next update under a DIFFERENT schedule applies step-0 hyperparams
    cfg_b = OneCycleConfig(lr_max=3e-3, total_steps=20)
    opt_b = build_optimizer(cfg_b)
    up, st3 = opt_b.update(g, st2, params)
    lr_applied = float(st3[1].hyperparams["learning_rate"])
    b1_applied = float(st3[1].hyperparams["b1"])
    assert abs(lr_applied - float(one_cycle_lr(cfg_b)(0))) < 1e-9
    assert abs(b1_applied - float(one_cycle_mom(cfg_b)(0))) < 1e-9
