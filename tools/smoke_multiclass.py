"""Multi-class end-to-end learnability smoke (3 foreground classes).

Complements tools/smoke_e2e.py (single-class SSDD-style): classes are
color-coded rectangles, so the ODM classifier must actually separate
classes and the per-class NMS/eval paths are exercised with C > 2.

Recorded result (1x TPU v5 lite, bf16, from-scratch, 2026-08-16):
  1600 steps -> train-set AP 0.7492, AP50 0.9571
"""

import sys
import os.path as _osp
_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, _osp.join(_repo, "tests"))

import json
import os
import os.path as osp
import tempfile
import time

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import optax

from refinedet_tpu.config import TrainConfig, DetectConfig
from refinedet_tpu.data import COCODetection, BaseTransform
from refinedet_tpu.data.collate import detection_collate
from refinedet_tpu.eval import Evaluator
from refinedet_tpu.models import build_refinedet
from refinedet_tpu.train import create_train_state, make_optimizer, \
    make_train_step

root = tempfile.mkdtemp()
rng = np.random.RandomState(0)
COLORS = {1: (230, 60, 60), 2: (60, 230, 60), 3: (60, 60, 230)}
images, annotations = [], []
ann_id = 1
os.makedirs(osp.join(root, "sarship_train"))
os.makedirs(osp.join(root, "annotations"))
for i in range(16):
    img_id = i + 1
    img = rng.randint(0, 60, (160, 160, 3)).astype(np.uint8)
    for _ in range(rng.randint(1, 4)):
        w, h = rng.randint(20, 70, 2)
        x, y = rng.randint(0, 160 - w), rng.randint(0, 160 - h)
        cls = rng.randint(1, 4)
        img[y:y + h, x:x + w] = COLORS[cls]
        annotations.append({"id": ann_id, "image_id": img_id,
                            "category_id": cls,
                            "bbox": [float(x), float(y),
                                     float(w), float(h)],
                            "area": float(w * h), "iscrowd": 0})
        ann_id += 1
    cv2.imwrite(osp.join(root, "sarship_train", f"{img_id:06d}.jpg"), img)
    images.append({"id": img_id, "file_name": f"{img_id:06d}.jpg",
                   "width": 160, "height": 160})
json.dump(
    {"images": images, "annotations": annotations,
     "categories": [{"id": c, "name": n, "supercategory": "x"}
                    for c, n in [(1, "red"), (2, "green"), (3, "blue")]]},
    open(osp.join(root, "annotations",
                  "instances_sarship_train.json"), "w"))

ds = COCODetection(root, [("sarship", "train")], None)
assert ds.num_classes == 4
bt = BaseTransform(320, (98.13,) * 3)
samples = []
for i in range(len(ds)):
    img, boxes, labels = ds[i]
    h, w = img.shape[:2]
    samples.append((bt(img), boxes / np.array([w, h, w, h], np.float32),
                    labels))
batch = detection_collate(samples, max_boxes=8)

model = build_refinedet("train", 320, 4, dtype=jnp.bfloat16)
cfg = TrainConfig(batch_size=16, max_boxes=8, lr=5e-4, grad_clip_norm=5.0)
sched = optax.join_schedules(
    [optax.linear_schedule(1e-5, cfg.lr, 100),
     optax.constant_schedule(cfg.lr),
     optax.constant_schedule(cfg.lr * 0.1)], [100, 1200])
tx = make_optimizer(sched, grad_clip_norm=cfg.grad_clip_norm)
state = create_train_state(model, jax.random.PRNGKey(0), tx)
step = make_train_step(model, tx, cfg)
args = tuple(jnp.asarray(x) for x in
             (batch.images, batch.boxes, batch.labels, batch.valid))
t0 = time.time()
for it in range(1600):
    state, m = step(state, *args)
    if it % 400 == 0:
        print(f"it {it}: loss {float(m['loss']):.3f}", flush=True)
print(f"1600 steps in {time.time() - t0:.0f}s, "
      f"final loss {float(m['loss']):.3f}", flush=True)

test_model = build_refinedet("test", 320, 4, dtype=jnp.bfloat16)
ev = Evaluator(test_model, ds, DetectConfig(num_classes=4), bt,
               batch_size=16, nms_top_k=128)
all_boxes = ev.run({"params": jax.device_get(state.params)})
stats = ds.evaluate_detections(all_boxes, None)
print("MULTI-CLASS TRAIN-SET AP:", round(float(stats[0]), 4),
      "AP50:", round(float(stats[1]), 4), flush=True)
