"""Count XLA FLOPs for the RefineDet forward / train step (CPU backend).

Uses ``lower(...).compile().cost_analysis()`` on the CPU backend at a
small batch and scales linearly to the requested batch — FLOPs are
batch-proportional here (all convs/matmuls carry the batch dim). The
resulting totals back the MXU-utilization claims in README.md's
"where the time goes" note (verdict item #4).

Usage: JAX_PLATFORMS=cpu python tools/flops_train_step.py [batch]
"""

import os
import os.path as _osp
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SMALL = 4  # batch used for the actual compile; scaled up linearly


def main():
    import jax
    import jax.numpy as jnp

    from refinedet_tpu.config import TrainConfig
    from refinedet_tpu.losses.multibox import refinedet_multibox_loss
    from refinedet_tpu.models import build_refinedet
    from refinedet_tpu.train import create_train_state, make_optimizer

    model = build_refinedet("train", 320, 2, dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=SMALL, max_boxes=8)
    tx = make_optimizer(lambda s: 1e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)
    priors = model.priors

    images = jnp.zeros((SMALL, 320, 320, 3), jnp.float32)
    boxes = jnp.tile(jnp.asarray([0.2, 0.2, 0.6, 0.6], jnp.float32),
                     (SMALL, cfg.max_boxes, 1))
    labels = jnp.ones((SMALL, cfg.max_boxes), jnp.int32)
    valid = jnp.asarray(np.arange(cfg.max_boxes)[None]
                        < np.full((SMALL, 1), 2))

    def fwd(params, imgs):
        return model.module.apply({"params": params}, imgs, train=True)

    def loss_of(params, imgs):
        heads = fwd(params, imgs)
        preds = (*heads, priors)
        arm = refinedet_multibox_loss(
            preds, boxes, labels, valid, num_classes=2, use_arm=False,
            variances=model.cfg.variance)
        odm = refinedet_multibox_loss(
            preds, boxes, labels, valid, num_classes=model.cfg.num_classes,
            use_arm=True, variances=model.cfg.variance)
        return arm.loss_l + arm.loss_c + odm.loss_l + odm.loss_c

    def full(state, imgs):
        import optax
        loss, grads = jax.value_and_grad(loss_of)(state.params, imgs)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return loss, optax.apply_updates(state.params, updates)

    scale = BATCH / SMALL
    for name, fn, args in [
        ("forward", fwd, (state.params, images)),
        ("fwd+loss", loss_of, (state.params, images)),
        ("full step", full, (state, images)),
    ]:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        fl = cost.get("flops", float("nan")) * scale
        by = cost.get("bytes accessed", float("nan")) * scale
        print(f"{name:>10s} @ b{BATCH}: {fl / 1e12:8.3f} TFLOP   "
              f"{by / 1e9:8.2f} GB accessed   "
              f"arithmetic intensity {fl / by:6.1f} FLOP/B")


if __name__ == "__main__":
    main()
