import sys; import os.path as _osp
_repo = _osp.dirname(_osp.dirname(_osp.abspath(__file__)))
sys.path.insert(0, _repo); sys.path.insert(0, _osp.join(_repo, "tests"))
import tempfile, time
import numpy as np
import jax, jax.numpy as jnp
from data_fixtures import make_coco_dataset
from refinedet_tpu.config import TrainConfig, DetectConfig
from refinedet_tpu.data import COCODetection, BaseTransform
from refinedet_tpu.models import build_refinedet
from refinedet_tpu.train import create_train_state, make_optimizer, make_train_step
from refinedet_tpu.eval import Evaluator
from refinedet_tpu.data.collate import detection_collate

root = tempfile.mkdtemp()
make_coco_dataset(root, num_images=16, img_size=160, seed=3)
ds = COCODetection(root, [("sarship", "train")], None)
MEAN = (98.13131,)*3
bt = BaseTransform(320, MEAN)

# fixed training batch: all 16 images, deterministic resize only
samples = []
for i in range(len(ds)):
    img, boxes, labels = ds[i]
    h, w = img.shape[:2]
    x = bt(img)
    sb = boxes / np.array([w, h, w, h], np.float32)
    samples.append((x, sb, labels))
batch = detection_collate(samples, max_boxes=8)

model = build_refinedet("train", 320, 2, dtype=jnp.bfloat16)
cfg = TrainConfig(batch_size=16, max_boxes=8, lr=5e-4, grad_clip_norm=5.0)
import optax
sched = optax.linear_schedule(1e-5, cfg.lr, 100)
tx = make_optimizer(sched, grad_clip_norm=cfg.grad_clip_norm)
state = create_train_state(model, jax.random.PRNGKey(0), tx)
step = make_train_step(model, tx, cfg)
args = tuple(jnp.asarray(x) for x in (batch.images, batch.boxes, batch.labels, batch.valid))
t0 = time.time()
for it in range(600):
    state, m = step(state, *args)
    if it % 100 == 0:
        print(f"it {it}: loss {float(m['loss']):.3f} odm_c {float(m['odm_loss_c']):.3f} npos {float(m['num_pos_odm']):.0f}", flush=True)
print(f"600 steps in {time.time()-t0:.0f}s, final loss {float(m['loss']):.3f}", flush=True)

# eval on train images (overfit check)
test_model = build_refinedet("test", 320, 2, dtype=jnp.bfloat16)
dcfg = DetectConfig(num_classes=2)
ev = Evaluator(test_model, ds, dcfg, bt, batch_size=16, nms_top_k=128)
all_boxes = ev.run({"params": jax.device_get(state.params)})
stats = ds.evaluate_detections(all_boxes, None)
print("TRAIN-SET AP:", round(float(stats[0]), 4), "AP50:", round(float(stats[1]), 4), flush=True)

# Recorded results (1x TPU v5 lite, bf16, from-scratch, 2026-08-16):
#   600 steps (this script): loss 1140.1 -> 5.6 in 127 s;
#     train-set AP 0.4615, AP50 0.7283, AP75 0.524
#   2000 steps (same harness, lr decay x0.1 at 1500): full convergence —
#     train-set AP 0.8777, AP50 1.000, AP75 1.000
# This is the end-to-end learnability smoke: synthetic bright-rectangle
# SSDD-style data, no pretrained backbone, full pipeline
# (staging -> matching -> ARM/ODM losses -> SGD -> Pallas NMS -> COCOeval).
