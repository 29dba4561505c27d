"""Int8 calibration-count study: does more calibration data close the
strict-AP gap? (follow-up to tools/ablate_int8.py, which uses 16 images)

Trains one synthetic fixture from scratch, then serves int8-default with
calibration streams of 8/16/32/64 images and reports AP/AP50 vs bf16.

Usage: python tools/calib_study.py [--size 320] [--steps 2500] [--seed 0]
"""

import argparse
import os.path as _osp
import sys
import tempfile

_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, _osp.join(_repo, "tests"))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default=320, type=int)
    p.add_argument("--steps", default=2500, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--batch", default=16, type=int)
    args = p.parse_args()

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

    n_images, size, seed = 64, args.size, args.seed
    root = tempfile.mkdtemp(prefix=f"calib_s{seed}_")
    make_coco_dataset(root, num_images=n_images, img_size=160, seed=seed)
    ds = COCODetection(root, [("sarship", "train")], None)
    bt = BaseTransform(size, (98.13131,) * 3)

    samples = []
    for i in range(len(ds)):
        img, boxes, labels = ds[i]
        h, w = img.shape[:2]
        samples.append((bt(img), boxes / np.array([w, h, w, h], np.float32),
                        labels))
    batches = [detection_collate(samples[b:b + args.batch], max_boxes=8)
               for b in range(0, n_images, args.batch)]
    batches = [tuple(jnp.asarray(x) for x in (b.images, b.boxes, b.labels,
                                              b.valid)) for b in batches]

    model = build_refinedet("train", size, 2, dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=args.batch, max_boxes=8, lr=5e-4,
                      grad_clip_norm=5.0)
    sched = optax.join_schedules(
        [optax.linear_schedule(1e-5, cfg.lr, 100),
         optax.constant_schedule(cfg.lr * 0.1)], [int(args.steps * 0.75)])
    tx = make_optimizer(sched, grad_clip_norm=cfg.grad_clip_norm)
    state = create_train_state(model, jax.random.PRNGKey(seed), tx)
    step = make_train_step(model, tx, cfg)
    for it in range(args.steps):
        state, m = step(state, *batches[it % len(batches)])
    print(f"trained: loss {float(m['loss']):.3f}", flush=True)

    variables = {"params": jax.device_get(state.params)}
    dcfg = DetectConfig(num_classes=2)
    test_model = build_refinedet("test", size, 2, dtype=jnp.bfloat16)

    def ap_of(mdl, v):
        ev = Evaluator(mdl, ds, dcfg, bt, batch_size=16, nms_top_k=128,
                       log=lambda s: None)
        stats = ds.evaluate_detections(ev.run(v), None)
        return float(stats[0]), float(stats[1])

    ap, ap50 = ap_of(test_model, variables)
    print(f"bf16:      AP {ap:.4f}  AP50 {ap50:.4f}", flush=True)

    all_imgs = np.stack([bt(ds.pull_image(i)[0]) for i in range(n_images)])
    for n_calib in (8, 16, 32, 64):
        calib = [all_imgs[i:i + 16].astype(np.float32)
                 for i in range(0, n_calib, 16)]
        mq, vq = quantize_model(test_model, variables, calib)
        ap, ap50 = ap_of(mq, vq)
        print(f"int8 calib={n_calib:3d}: AP {ap:.4f}  AP50 {ap50:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
