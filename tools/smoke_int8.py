"""Int8 accuracy smoke: train RefineDet320 from scratch on a 64-image
synthetic SSDD-style fixture (4 rotating batches — generalization, not
pure memorization), then compare train-set AP served in bf16 vs the int8
PTQ twin (refinedet_tpu/quant), plus a matched random-weight-noise
control that bounds how perturbation-sensitive the fixture itself is.

Complements tests/test_quant.py (random-init closeness, CPU) with a
trained-model, real-NMS, COCOeval comparison on the chip.
"""
import sys
import os.path as _osp
_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, _osp.join(_repo, "tests"))
import tempfile
import time

import numpy as np
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

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
N_IMAGES, BATCH = 64, 16

root = tempfile.mkdtemp()
make_coco_dataset(root, num_images=N_IMAGES, img_size=160, seed=3)
ds = COCODetection(root, [("sarship", "train")], None)
MEAN = (98.13131,) * 3
bt = BaseTransform(320, MEAN)

samples = []
for i in range(len(ds)):
    img, boxes, labels = ds[i]
    h, w = img.shape[:2]
    samples.append((bt(img), boxes / np.array([w, h, w, h], np.float32),
                    labels))
batches = [detection_collate(samples[b:b + BATCH], max_boxes=8)
           for b in range(0, N_IMAGES, BATCH)]
batches = [tuple(jnp.asarray(x) for x in (b.images, b.boxes, b.labels,
                                          b.valid)) for b in batches]

model = build_refinedet("train", 320, 2, dtype=jnp.bfloat16)
cfg = TrainConfig(batch_size=BATCH, max_boxes=8, lr=5e-4,
                  grad_clip_norm=5.0)
sched = optax.join_schedules(
    [optax.linear_schedule(1e-5, cfg.lr, 100),
     optax.constant_schedule(cfg.lr * 0.1)], [int(STEPS * 0.75)])
tx = make_optimizer(sched, grad_clip_norm=cfg.grad_clip_norm)
state = create_train_state(model, jax.random.PRNGKey(0), tx)
step = make_train_step(model, tx, cfg)
t0 = time.time()
for it in range(STEPS):
    state, m = step(state, *batches[it % len(batches)])
    if it % 500 == 0:
        print(f"it {it}: loss {float(m['loss']):.3f}", flush=True)
print(f"{STEPS} steps in {time.time()-t0:.0f}s, "
      f"final loss {float(m['loss']):.3f}", flush=True)

variables = {"params": jax.device_get(state.params)}
dcfg = DetectConfig(num_classes=2)


def ap_of(mdl, v, tag):
    ev = Evaluator(mdl, ds, dcfg, bt, batch_size=16, nms_top_k=128)
    stats = ds.evaluate_detections(ev.run(v), None)
    print(f"{tag} TRAIN-SET AP: {float(stats[0]):.4f} "
          f"AP50: {float(stats[1]):.4f}", flush=True)
    return float(stats[0]), float(stats[1])


test_model = build_refinedet("test", 320, 2, dtype=jnp.bfloat16)
ap_f, _ = ap_of(test_model, variables, "bf16")

# control: random weight noise matched to the int8 weight-quant step
# (uniform +-step/2) — how perturbation-sensitive is this fixture at all?
rng = np.random.RandomState(0)
pn = dict(variables["params"])
for name, leaves in variables["params"].items():
    if "kernel" not in leaves or name.startswith(("arm_", "odm_")) \
            or name == "vgg_conv1_1" or "deconv" in name:
        continue
    w = np.asarray(leaves["kernel"], np.float32)
    s = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    pn[name] = dict(leaves)
    pn[name]["kernel"] = jnp.asarray(
        w + rng.uniform(-0.5, 0.5, w.shape).astype(np.float32) * s)
ap_n, _ = ap_of(test_model, {"params": pn}, "bf16+noise-ctl")

calib = np.stack([bt(ds.pull_image(i)[0]
                     if isinstance(ds.pull_image(i), tuple)
                     else ds.pull_image(i)) for i in range(16)])
model_q, vq = quantize_model(test_model, variables,
                             [calib.astype(np.float32)])
ap_q, _ = ap_of(model_q, vq, "int8")
print(f"AP delta (int8 - bf16): {ap_q - ap_f:+.4f} "
      f"(noise-control delta {ap_n - ap_f:+.4f})")
