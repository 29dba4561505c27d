"""Multi-seed int8 PTQ accuracy ablation (verdict item #8).

For >=5 seeds (fresh synthetic fixture + fresh init per seed): train a
RefineDet from scratch on the 64-image rotating-batch fixture, then compare
train-set AP served as
  bf16            — baseline
  int8-default    — DEFAULT_QUANT_SKIP (early-VGG convs kept bf16)
  int8-full       — everything quantizable quantized
  *-bc            — same, plus DFQ-style bias correction
                    (quant.bias_correction_delta from the calib means)
  noise-control   — bf16 + weight noise matched to the int8 quant step
                    (bounds the fixture's own perturbation sensitivity)
and report mean +- std AP deltas vs bf16 per config. Run for both sizes:

  python tools/ablate_int8.py --size 320 --seeds 5 --steps 2500
  python tools/ablate_int8.py --size 512 --seeds 5 --steps 2000

Results land in README's int8 ablation table.
"""

import argparse
import os.path as _osp
import sys
import tempfile
import time

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, _osp.join(_repo, "tests"))

import numpy as np


def run_seed(seed, size, steps, batch):
    import jax
    import jax.numpy as jnp
    import optax

    from data_fixtures import make_coco_dataset
    from refinedet_tpu.config import TrainConfig, DetectConfig
    from refinedet_tpu.data import COCODetection, BaseTransform
    from refinedet_tpu.data.collate import detection_collate
    from refinedet_tpu.models import build_refinedet
    from refinedet_tpu.quant import quantize_model
    from refinedet_tpu.train import (create_train_state, make_optimizer,
                                     make_train_step)
    from refinedet_tpu.eval import Evaluator

    n_images = 64
    root = tempfile.mkdtemp(prefix=f"ablate_s{seed}_")
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
    t0 = time.time()
    for it in range(steps):
        state, m = step(state, *batches[it % len(batches)])
    print(f"seed {seed}: {steps} steps in {time.time() - t0:.0f}s, "
          f"loss {float(m['loss']):.3f}", flush=True)

    variables = {"params": jax.device_get(state.params)}
    dcfg = DetectConfig(num_classes=2)
    test_model = build_refinedet("test", size, 2, dtype=jnp.bfloat16)

    def ap_of(mdl, v):
        ev = Evaluator(mdl, ds, dcfg, bt, batch_size=16, nms_top_k=128,
                       log=lambda s: None)
        stats = ds.evaluate_detections(ev.run(v), None)
        return {"ap": float(stats[0]), "ap50": float(stats[1])}

    out = {"bf16": ap_of(test_model, variables)}

    # Noise controls: perturbation matched to the int8 weight-quant step,
    # one per quant config — each perturbs EXACTLY the layer set that the
    # corresponding quant config actually quantizes (int8-default keeps
    # DEFAULT_QUANT_SKIP's early-VGG convs in bf16, so its control must
    # skip them too, or the noise floor is inflated and flatters the
    # int8-default delta).
    from refinedet_tpu.quant import DEFAULT_QUANT_SKIP

    def noise_params(extra_skip):
        rng = np.random.RandomState(seed)
        pn = dict(variables["params"])
        for name, leaves in variables["params"].items():
            if "kernel" not in leaves or name.startswith(("arm_", "odm_")) \
                    or name == "vgg_conv1_1" or "deconv" in name \
                    or name in extra_skip:
                continue
            w = np.asarray(leaves["kernel"], np.float32)
            s = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
            pn[name] = dict(leaves)
            pn[name]["kernel"] = jnp.asarray(
                w + rng.uniform(-0.5, 0.5, w.shape).astype(np.float32) * s)
        return {"params": pn}

    out["noise-ctl-default"] = ap_of(test_model,
                                     noise_params(DEFAULT_QUANT_SKIP))
    out["noise-ctl-full"] = ap_of(test_model, noise_params(()))

    calib = np.stack([bt(ds.pull_image(i)[0]) for i in range(16)])
    for tag, skip, bc in (("int8-default", None, False),
                          ("int8-default-bc", None, True),
                          ("int8-full", (), False),
                          ("int8-full-bc", (), True)):
        kw = {} if skip is None else {"quant_skip": skip}
        mq, vq = quantize_model(test_model, variables,
                                [calib.astype(np.float32)],
                                bias_correct=bc, **kw)
        out[tag] = ap_of(mq, vq)
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
    args = p.parse_args()

    rows = [run_seed(s, args.size, args.steps, args.batch)
            for s in range(args.seeds)]
    keys = list(rows[0])
    print(f"\n== int8 ablation, RefineDet{args.size}, {args.seeds} seeds, "
          f"{args.steps} steps ==")
    for metric in ("ap", "ap50"):
        base = np.array([r["bf16"][metric] for r in rows])
        for k in keys:
            v = np.array([r[k][metric] for r in rows])
            d = v - base
            print(f"{k:>13s}: {metric.upper():>4s} {v.mean():.4f} "
                  f"+- {v.std():.4f}   "
                  f"delta vs bf16 {d.mean():+.4f} +- {d.std():.4f}")


if __name__ == "__main__":
    main()
