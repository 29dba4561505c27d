"""Multi-seed EMA accuracy ablation (round-3 verdict item #3).

The in-step EMA (--ema_decay / --use_ema) shipped with formula unit
tests but no accuracy evidence. This measures it with the same harness
discipline as tools/ablate_int8.py: per seed, train a RefineDet from
scratch on the 64-image rotating-batch fixture while carrying SHADOW
EMAs at several decay values (training dynamics are deterministic and
EMA-independent, so one run yields every decay), then compare train-set
AP/AP50 of the final raw weights vs each EMA.

The shadow update replicates train_step's exact schedule — warmup-ramped
``min(d, (1+t)/(10+t))`` applied to the post-update params — which
``tests/test_train_step.py::test_ema_tracks_manual_formula`` pins as the
production formula.

  python tools/ablate_ema.py --size 320 --seeds 5 --steps 2500

Results land in README's EMA ablation row.
"""

import argparse
import functools
import os.path as _osp
import sys
import tempfile
import time

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, _osp.join(_repo, "tests"))

import numpy as np

DECAYS = (0.99, 0.999, 0.9998)


def run_seed(seed, size, steps, batch, decays):
    import jax
    import jax.numpy as jnp
    import optax

    from data_fixtures import make_coco_dataset
    from refinedet_tpu.config import TrainConfig, DetectConfig
    from refinedet_tpu.data import COCODetection, BaseTransform
    from refinedet_tpu.data.collate import detection_collate
    from refinedet_tpu.models import build_refinedet
    from refinedet_tpu.train import (create_train_state, make_optimizer,
                                     make_train_step)
    from refinedet_tpu.eval import Evaluator

    n_images = 64
    root = tempfile.mkdtemp(prefix=f"ablate_ema_s{seed}_")
    make_coco_dataset(root, num_images=n_images, img_size=160, seed=seed)
    ds = COCODetection(root, [("sarship", "train")], None)
    bt = BaseTransform(size, (98.13131,) * 3)

    samples = []
    for i in range(len(ds)):
        img, boxes, labels = ds[i]
        h, w = img.shape[:2]
        samples.append((bt(img), boxes / np.array([w, h, w, h], np.float32),
                        labels))
    batches = [detection_collate(samples[b:b + batch], max_boxes=8)
               for b in range(0, n_images, batch)]
    batches = [tuple(jnp.asarray(x) for x in (b.images, b.boxes, b.labels,
                                              b.valid)) for b in batches]

    model = build_refinedet("train", size, 2, dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=batch, max_boxes=8, lr=5e-4,
                      grad_clip_norm=5.0)
    sched = optax.join_schedules(
        [optax.linear_schedule(1e-5, cfg.lr, 100),
         optax.constant_schedule(cfg.lr * 0.1)], [int(steps * 0.75)])
    tx = make_optimizer(sched, grad_clip_norm=cfg.grad_clip_norm)
    state = create_train_state(model, jax.random.PRNGKey(seed), tx)
    step = make_train_step(model, tx, cfg)

    # train_step's exact EMA schedule, as a shadow per decay value
    @functools.partial(jax.jit, static_argnums=2)
    def ema_update(ema, params, decay, t):
        d = jnp.minimum(jnp.float32(decay), (1.0 + t) / (10.0 + t))
        return jax.tree.map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema, params)

    emas = {d: jax.tree.map(jnp.copy, state.params) for d in decays}
    t0 = time.time()
    for it in range(steps):
        state, m = step(state, *batches[it % len(batches)])
        t = jnp.float32(it + 1)
        for d in decays:
            emas[d] = ema_update(emas[d], state.params, d, t)
    print(f"seed {seed}: {steps} steps in {time.time() - t0:.0f}s, "
          f"loss {float(m['loss']):.3f}", flush=True)

    dcfg = DetectConfig(num_classes=2)
    test_model = build_refinedet("test", size, 2, dtype=jnp.bfloat16)

    def ap_of(params):
        ev = Evaluator(test_model, ds, dcfg, bt, batch_size=16,
                       nms_top_k=128, log=lambda s: None)
        stats = ds.evaluate_detections(
            ev.run({"params": jax.device_get(params)}), None)
        return {"ap": float(stats[0]), "ap50": float(stats[1])}

    out = {"raw": ap_of(state.params)}
    for d in decays:
        out[f"ema-{d}"] = ap_of(emas[d])
    print(f"seed {seed}: " + "  ".join(
        f"{k}={v['ap']:.4f}/{v['ap50']:.4f}" for k, v in out.items()),
        flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default=320, type=int, choices=(320, 512))
    p.add_argument("--seeds", default=5, type=int)
    p.add_argument("--steps", default=2500, type=int)
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--decays", default=",".join(map(str, DECAYS)))
    args = p.parse_args()
    decays = tuple(float(d) for d in args.decays.split(","))

    rows = [run_seed(s, args.size, args.steps, args.batch, decays)
            for s in range(args.seeds)]
    keys = list(rows[0])
    print(f"\n== EMA ablation, RefineDet{args.size}, {args.seeds} seeds, "
          f"{args.steps} steps ==")
    for metric in ("ap", "ap50"):
        base = np.array([r["raw"][metric] for r in rows])
        for k in keys:
            v = np.array([r[k][metric] for r in rows])
            d = v - base
            print(f"{k:>12s}: {metric.upper():>4s} {v.mean():.4f} "
                  f"+- {v.std():.4f}   "
                  f"delta vs raw {d.mean():+.4f} +- {d.std():.4f}")


if __name__ == "__main__":
    main()
