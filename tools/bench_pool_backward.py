"""A/B the 2x2 maxpool backward implementations inside the FULL train step.

The b128 train-step trace (tools/TRACE_NOTES.md) showed select_and_scatter
(XLA's reduce_window VJP — maxpool backward) at ~9% of device time.
models/layers.py's POOL_BACKWARD="slice" replaces it with an exact
first-tie-wins slice/compare/interleave backward (bitwise-identical
gradients, verified in tests/test_model.py). This times the full train
step (chained in-program iterations with a fetched accumulator — the
relay-honest pattern, see .claude/skills/verify/SKILL.md) under both.

Usage: python tools/bench_pool_backward.py [batch] [iters]
"""

import os.path as _osp
import sys
import time

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def step_ms(mode: str) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    import refinedet_tpu.models.layers as layers
    layers.POOL_BACKWARD = mode
    from refinedet_tpu.config import TrainConfig
    from refinedet_tpu.losses.multibox import refinedet_multibox_loss
    from refinedet_tpu.models import build_refinedet
    from refinedet_tpu.train import create_train_state, make_optimizer

    model = build_refinedet("train", 320, 2, dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=BATCH, max_boxes=8)
    tx = make_optimizer(lambda s: 1e-4)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.uniform(-120, 130, (BATCH, 320, 320, 3))
                         .astype(np.float32))
    boxes = jnp.asarray(np.tile(np.array([0.2, 0.2, 0.6, 0.6], np.float32),
                                (BATCH, cfg.max_boxes, 1)))
    labels = jnp.ones((BATCH, cfg.max_boxes), jnp.int32)
    valid = jnp.asarray(np.arange(cfg.max_boxes)[None]
                        < np.full((BATCH, 1), 2))
    priors = model.priors

    def loss_of(params, imgs):
        heads = model.module.apply({"params": params}, imgs, train=True)
        preds = (*heads, priors)
        arm = refinedet_multibox_loss(
            preds, boxes, labels, valid, num_classes=2, use_arm=False,
            variances=model.cfg.variance)
        odm = refinedet_multibox_loss(
            preds, boxes, labels, valid, num_classes=model.cfg.num_classes,
            use_arm=True, variances=model.cfg.variance)
        return arm.loss_l + arm.loss_c + odm.loss_l + odm.loss_c

    def v_full(st, imgs):
        loss, grads = jax.value_and_grad(loss_of)(st.params, imgs)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        return loss, st.replace(step=st.step + 1, params=new_params,
                                opt_state=new_opt)

    @jax.jit
    def chained(st, imgs):
        def body(_, carry):
            x, st2, acc = carry
            val, st2 = v_full(st2, x)
            val = val.astype(jnp.float32)
            return (x + val * 1e-12, st2, acc + val)
        return jax.lax.fori_loop(0, ITERS, body,
                                 (imgs, st, jnp.float32(0.0)))

    out = chained(state, images + 1.0)
    jax.block_until_ready(out)
    for _ in range(2):  # first timed run can absorb a one-time relay cost
        t0 = time.time()
        out = chained(state, images)
        float(out[2])
        ms = (time.time() - t0) / ITERS * 1000
    return ms


def main():
    for mode in ("select_scatter", "slice"):
        ms = step_ms(mode)
        print(f"{mode:>15s}: {ms:7.2f} ms/step  "
              f"({BATCH / ms * 1000:6.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
