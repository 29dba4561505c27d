"""Multi-seed int8 PTQ accuracy ablation (verdict item #8).

For >=5 seeds (fresh synthetic fixture + fresh init per seed): train a
RefineDet from scratch on the 64-image rotating-batch fixture, then compare
train-set AP served as
  bf16            — baseline
  int8-default    — DEFAULT_QUANT_SKIP (early-VGG convs kept bf16)
  int8-full       — everything quantizable quantized
  *-bc            — plus DFQ-style bias correction
                    (quant.bias_correction_delta from the calib means)
  *-gptq          — plus second-order GPTQ weight rounding
                    (quant/gptq.py, Hessians from the same calib stream)
  noise-control   — bf16 + weight noise matched to the int8 quant step
                    (bounds the fixture's own perturbation sensitivity)
and report mean +- std AP deltas vs bf16 per config. Run for both sizes:

  python tools/ablate_int8.py --size 320 --seeds 5 --steps 2500
  python tools/ablate_int8.py --size 512 --seeds 5 --steps 2000

Trained per-seed params are cached under tools/.ablate_ckpt/ (training is
deterministic per seed), so adding a serving arm later re-quantizes and
re-evaluates without retraining; --configs picks a subset of arms.

Results land in README's int8 ablation table.
"""

import argparse
import json
import os
import os.path as _osp
import pickle
import sys
import tempfile
import time

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, _osp.join(_repo, "tests"))

import numpy as np

_CKPT_DIR = _osp.join(_repo, "tools", ".ablate_ckpt")

def resolve_quant_skip(skip):
    """Map an INT8_CONFIGS skip entry to the builder kwarg.

    build_refinedet's quant_skip default is () (quantize everything) —
    the DEFAULT_QUANT_SKIP convention lives in quantize_model — so None
    ("the default config") must resolve to DEFAULT_QUANT_SKIP explicitly
    here, or the default arms silently duplicate the full arms.
    """
    from refinedet_tpu.quant import DEFAULT_QUANT_SKIP
    return DEFAULT_QUANT_SKIP if skip is None else skip


# tag -> (quant_skip or None for default, bias_correct, gptq)
INT8_CONFIGS = {
    "int8-default": (None, False, False),
    "int8-default-bc": (None, True, False),
    "int8-default-gptq": (None, False, True),
    "int8-default-gptq-bc": (None, True, True),
    "int8-full": ((), False, False),
    "int8-full-bc": ((), True, False),
    "int8-full-gptq": ((), False, True),
    "int8-full-gptq-bc": ((), True, True),
}
ALL_CONFIGS = ("bf16", "noise-ctl-default", "noise-ctl-full",
               *INT8_CONFIGS)


def run_seed(seed, size, steps, batch, configs, have=()):
    """Train-or-restore seed `seed` and evaluate the serving arms in
    `configs`, skipping any arm already in `have` (the resume sidecar's
    cached results for this seed) — chip evals are minutes each, so a
    resumed run must not repeat them."""
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

    ckpt = _osp.join(_CKPT_DIR,
                     f"refinedet{size}_s{seed}_st{steps}_b{batch}.pkl")
    if _osp.exists(ckpt):
        with open(ckpt, "rb") as f:
            variables = {"params": pickle.load(f)}
        # Loud provenance: the cache is keyed on size/seed/steps/batch only,
        # NOT on model/train code version — if models/ or train/ changed
        # since this mtime, delete tools/.ablate_ckpt/ to retrain.
        mtime = time.strftime("%Y-%m-%d %H:%M",
                              time.localtime(_osp.getmtime(ckpt)))
        print(f"seed {seed}: restored trained params from {ckpt} "
              f"(trained {mtime}; cache is NOT code-versioned)", flush=True)
    else:
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
        os.makedirs(_CKPT_DIR, exist_ok=True)
        with open(ckpt, "wb") as f:
            pickle.dump(variables["params"], f)
    dcfg = DetectConfig(num_classes=2)
    test_model = build_refinedet("test", size, 2, dtype=jnp.bfloat16)

    def ap_of(mdl, v):
        ev = Evaluator(mdl, ds, dcfg, bt, batch_size=16, nms_top_k=128,
                       log=lambda s: None)
        stats = ds.evaluate_detections(ev.run(v), None)
        return {"ap": float(stats[0]), "ap50": float(stats[1])}

    configs = configs - set(have)
    out = {}
    if "bf16" in configs:
        out["bf16"] = ap_of(test_model, variables)

    # Noise controls: perturbation matched to the int8 weight-quant step,
    # one per quant config — each perturbs EXACTLY the layer set that the
    # corresponding quant config actually quantizes (int8-default keeps
    # DEFAULT_QUANT_SKIP's early-VGG convs in bf16, so its control must
    # skip them too, or the noise floor is inflated and flatters the
    # int8-default delta).
    from refinedet_tpu.quant import (DEFAULT_QUANT_SKIP, calibrate_amax,
                                     quantize_variables)

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

    if "noise-ctl-default" in configs:
        out["noise-ctl-default"] = ap_of(test_model,
                                         noise_params(DEFAULT_QUANT_SKIP))
    if "noise-ctl-full" in configs:
        out["noise-ctl-full"] = ap_of(test_model, noise_params(()))

    int8_arms = [(t, *INT8_CONFIGS[t]) for t in INT8_CONFIGS
                 if t in configs]
    if int8_arms:
        # One shared calibration pass feeds every arm: amax stats + input
        # means (bias correction) + im2col Hessians (GPTQ), all from the
        # same 16-image stream quantize_model would use.
        calib = [np.stack([bt(ds.pull_image(i)[0])
                           for i in range(16)]).astype(np.float32)]
        amax, means = calibrate_amax(test_model, variables, calib,
                                     return_means=True)
        hessians = None
        if any(gptq for _, _, _, gptq in int8_arms):
            from refinedet_tpu.quant.gptq import accumulate_hessians
            hessians = accumulate_hessians(test_model, variables, calib)
        # One GPTQ solve per conv per seed: the arms share weights +
        # calibration, so the skip-set/bias-correction twins reuse the
        # cached rounded kernels (the host-side Cholesky dominates the
        # arm sweep's wall time otherwise).
        gptq_cache = {}
        for tag, skip, bc, gptq in int8_arms:
            mq = build_refinedet(
                "test", size, 2, dtype=jnp.bfloat16, quant=True,
                quant_skip=resolve_quant_skip(skip))
            vq = quantize_variables(mq, variables, amax,
                                    means=means if bc else None,
                                    hessians=hessians if gptq else None,
                                    gptq_cache=gptq_cache)
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
    p.add_argument("--configs", default="all",
                   help="comma-separated subset of serving arms "
                        f"({','.join(ALL_CONFIGS)}); bf16 always runs "
                        "(it is the delta base)")
    args = p.parse_args()
    if args.configs == "all":
        configs = set(ALL_CONFIGS)
    else:
        configs = {c for c in args.configs.split(",") if c}
        unknown = configs - set(ALL_CONFIGS)
        if unknown:
            p.error(f"unknown configs: {sorted(unknown)}")
        configs.add("bf16")

    # Per-seed results persist to a JSON sidecar so a killed run (round-4's
    # failure mode: chip reclaimed mid-ablation) resumes from the last
    # completed seed instead of re-evaluating everything.
    res_path = _osp.join(
        _CKPT_DIR,
        f"results_{args.size}_st{args.steps}_b{args.batch}.json")
    done = {}
    if _osp.exists(res_path):
        with open(res_path) as f:
            done = json.load(f)

    rows = []
    for s in range(args.seeds):
        cached = done.get(str(s))
        if cached is not None and configs <= set(cached):
            print(f"seed {s}: restored results from {res_path}", flush=True)
            rows.append(cached)
            continue
        out = run_seed(s, args.size, args.steps, args.batch, configs,
                       have=set(cached or {}))
        done[str(s)] = {**(cached or {}), **out}
        os.makedirs(_CKPT_DIR, exist_ok=True)
        with open(res_path, "w") as f:
            json.dump(done, f, indent=1)
        rows.append(done[str(s)])
    keys = [k for k in rows[0] if k in configs]
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
