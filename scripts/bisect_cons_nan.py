"""CPU bisection of the consistency-loss NaN gradient.

Consumes /tmp/cons_inputs.npz (scripts/dump_cons_inputs.py: warm-start
SESSD step-1 preds for student and teacher) and computes
grad(consistency_loss) wrt the student preds under a series of
stop_gradient probes to pin the op whose VJP emits the NaN.
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from sessd_tpu.core import rotated_iou  # noqa: E402
from sessd_tpu.train import losses  # noqa: E402


def main():
    import ml_dtypes

    d = np.load("/tmp/cons_inputs.npz")

    def arr(k):
        a = d[k]
        if a.dtype == np.dtype("V2"):  # savez round-trips bf16 as void-2
            a = a.view(ml_dtypes.bfloat16).astype(np.float32)
        return jnp.asarray(a)

    preds_stu = {k[4:]: arr(k) for k in d.files if k.startswith("stu_")}
    preds_tea = {k[4:]: arr(k) for k in d.files if k.startswith("tea_")}
    b = preds_stu["box_preds"].shape[0]
    anchors = jnp.broadcast_to(jnp.asarray(d["anchors"]),
                               (b,) + d["anchors"].shape)
    transformation = {k: jnp.asarray(d[k])
                      for k in ("flipped", "noise_rotation", "noise_scale")}
    cfg = losses.ConsistencyConfig()

    def run(tag):
        def f(ps):
            total, _ = losses.consistency_loss(
                ps, preds_tea, anchors, transformation, cfg)
            return total
        val, g = jax.value_and_grad(f)(preds_stu)
        bad = [k for k, v in g.items() if not np.isfinite(np.asarray(v)).all()]
        print(f"{tag}: loss={float(val):.5f} bad_grads={bad}", flush=True)
        return bad

    run("baseline")

    # probe 1: stop-gradient the whole iou matrix
    orig_iou = rotated_iou.iou_bev_matrix
    losses.iou_bev_matrix = lambda a, bx: jax.lax.stop_gradient(orig_iou(a, bx))
    run("stopgrad(iou_bev_matrix)")
    losses.iou_bev_matrix = orig_iou

    # probe 2: stop-gradient the transformed teacher boxes (already
    # stop-gradiented upstream in train_step — should be a no-op)
    orig_t = losses._transform_teacher_boxes
    losses._transform_teacher_boxes = (
        lambda *a: jax.lax.stop_gradient(orig_t(*a)))
    run("stopgrad(teacher boxes)")
    losses._transform_teacher_boxes = orig_t

    # probe 3: stop-gradient add_sin_difference
    orig_s = losses.box_jax.add_sin_difference
    losses.box_jax.add_sin_difference = (
        lambda a, bx: tuple(map(jax.lax.stop_gradient, orig_s(a, bx))))
    run("stopgrad(add_sin_difference)")
    losses.box_jax.add_sin_difference = orig_s

    # probe 4: stop-gradient the decoded student boxes (kills box term grad)
    orig_d = losses.box_jax.second_box_decode
    losses.box_jax.second_box_decode = (
        lambda p, a: jax.lax.stop_gradient(orig_d(p, a)))
    run("stopgrad(second_box_decode)")
    losses.box_jax.second_box_decode = orig_d


if __name__ == "__main__":
    main()
