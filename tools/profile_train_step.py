"""Attribute the b64 train-step time (verdict item #4).

Round 1 measured the b64/320 train step at ~136 ms (~54% of bf16 MXU peak)
vs ~75% for inference, with only ~9 ms attributed to losses — this probe
decomposes the remaining gap by timing surgically reduced variants of the
SAME program shape, each with chained dependent iterations inside one jit
(the only honest timing through the relay — see
.claude/skills/verify/SKILL.md):

  fwd            forward only (the inference-shaped baseline, no heads use)
  fwd+loss       forward + ARM/ODM matching + losses (loss cost)
  grad           value_and_grad of (fwd+loss)        (backward cost)
  grad-nol       value_and_grad of a dummy head-sum loss (backward minus
                 loss-related backward)
  full           grad + SGD update                    (optimizer cost)

With ``--remat``, adds two experimental variants probing whether the
backward is activation-HBM-bound: full-remat (recompute everything) and
dots-policy remat (save conv outputs only).

Usage: python tools/profile_train_step.py [batch] [iters] [--remat]
"""

import os.path as _osp
import sys
import time

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)

import numpy as np

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
BATCH = int(_args[0]) if _args else 64
ITERS = int(_args[1]) if len(_args) > 1 else 10
REMAT = "--remat" in sys.argv


def main():
    import jax
    import jax.numpy as jnp
    import optax

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
    boxes = jnp.asarray(
        np.tile(np.array([0.2, 0.2, 0.6, 0.6], np.float32),
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

    def dummy_loss_of(params, imgs):
        heads = model.module.apply({"params": params}, imgs, train=True)
        return sum(h.sum() for h in heads) * 1e-6

    def v_fwd(state, imgs):
        heads = model.module.apply({"params": state.params}, imgs,
                                   train=True)
        return sum(h.sum() for h in heads), state

    def v_fwd_loss(state, imgs):
        return loss_of(state.params, imgs), state

    def v_grad(state, imgs):
        loss, grads = jax.value_and_grad(loss_of)(state.params, imgs)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)), state

    def v_grad_nol(state, imgs):
        loss, grads = jax.value_and_grad(dummy_loss_of)(state.params, imgs)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)), state

    def v_full(state, imgs):
        loss, grads = jax.value_and_grad(loss_of)(state.params, imgs)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt)
        return loss, new_state

    def v_grad_remat_full(state, imgs):
        loss, grads = jax.value_and_grad(jax.checkpoint(loss_of))(
            state.params, imgs)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)), state

    def v_grad_remat_dots(state, imgs):
        ck = jax.checkpoint(
            loss_of, policy=jax.checkpoint_policies.checkpoint_dots)
        loss, grads = jax.value_and_grad(ck)(state.params, imgs)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads)), state

    variants = [("fwd", v_fwd), ("fwd+loss", v_fwd_loss),
                ("grad-nol", v_grad_nol), ("grad", v_grad),
                ("full", v_full)]
    if REMAT:
        variants += [("grad-rmt", v_grad_remat_full),
                     ("grad-dots", v_grad_remat_dots)]

    results = {}
    for name, fn in variants:

        # Honest timing through the relay requires ALL of: (a) a scalar
        # accumulator in the loop carry that transitively depends on every
        # op under test (the summed value feeds BOTH the accumulator and
        # the next iteration's input), (b) returning that accumulator, and
        # (c) fetching it to the host. Idioms that merely chain the array
        # carry (`x + 0.0 * val`, `x + 1e-12 * val`, even
        # lax.optimization_barrier) get their loop bodies deleted by the
        # axon compile pipeline and report impossible sub-ms times —
        # verified empirically (HLO op histogram + iters-scaling probe).
        @jax.jit
        def chained(st, imgs, fn=fn):
            def body(_, carry):
                x, st2, acc = carry
                val, st2 = fn(st2, x)
                val = val.astype(jnp.float32)
                return (x + val * 1e-12, st2, acc + val)
            return jax.lax.fori_loop(
                0, ITERS, body, (imgs, st, jnp.float32(0.0)))

        # warm up on different inputs than the timed call; then time TWICE
        # and keep the second — the first timed execution of a fresh
        # program through the relay can absorb a large one-time cost
        # (program load), observed as a wild outlier on the first variant.
        out = chained(state, images + 1.0)
        jax.block_until_ready(out)
        for _ in range(2):
            t0 = time.time()
            out = chained(state, images)
            float(out[2])  # host fetch of the accumulator forces execution
            ms = (time.time() - t0) / ITERS * 1000
        results[name] = ms
        print(f"{name:>9s}: {ms:8.2f} ms/iter  "
              f"({BATCH / ms * 1000:7.1f} img/s)", flush=True)

    fwd = results["fwd"]
    print("\nattribution (b%d):" % BATCH)
    print(f"  forward            {fwd:7.2f} ms")
    print(f"  losses (fwd)       {results['fwd+loss'] - fwd:7.2f} ms")
    print(f"  backward (dummy)   {results['grad-nol'] - fwd:7.2f} ms")
    print(f"  loss-backward extra{results['grad'] - results['grad-nol'] - (results['fwd+loss'] - fwd):7.2f} ms")
    print(f"  optimizer          {results['full'] - results['grad']:7.2f} ms")
    print(f"  full step          {results['full']:7.2f} ms")


if __name__ == "__main__":
    main()
