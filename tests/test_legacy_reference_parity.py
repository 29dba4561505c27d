"""Legacy SSD paths vs the ACTUAL reference code.

Completes the reference-direct oracle coverage (test_reference_parity.py
covers the live RefineDet paths) for the two legacy components:

  (a) MultiBoxLoss values vs layers/modules/multibox_loss.py:10-127
      (match-based targets, 3:1 hard-negative mining, sum/N);
  (b) legacy Detect output [B, C, top_k, 5] vs
      layers/functions/detection.py:24-64 (single-step decode, per-class
      torch NMS with no +1 area, strict > conf threshold, score-ordered
      rows, zero padding — including the inert trailing rank-fill quirk).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_modules import load_reference, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("/root/reference not mounted", allow_module_level=True)

REF = load_reference()

from refinedet_tpu.config import DetectConfig  # noqa: E402
from refinedet_tpu.detect.detection import detect_ssd  # noqa: E402
from refinedet_tpu.losses.multibox import multibox_loss  # noqa: E402

NUM_CLASSES = 4
VARIANCES = (0.1, 0.2)


def _priors(n):
    """A well-spread subset of the reference RefineDet320 priors."""
    p = REF.PriorBox(REF.voc_refinedet["320"]).forward().numpy()
    idx = np.linspace(0, len(p) - 1, n).astype(int)
    return p[idx]


def _rand_gt(rng, n):
    cxcy = rng.uniform(0.2, 0.8, (n, 2))
    wh = rng.uniform(0.1, 0.5, (n, 2))
    boxes = np.clip(np.concatenate([cxcy - wh / 2, cxcy + wh / 2], 1),
                    0.0, 1.0).astype(np.float32)
    labels = rng.randint(0, NUM_CLASSES - 1, n)  # 0-based foreground ids
    return boxes, labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_legacy_multibox_loss_parity(seed, capsys):
    rng = np.random.RandomState(seed)
    num_p = 600
    priors = _priors(num_p)
    b = 3
    loc = rng.randn(b, num_p, 4).astype(np.float32) * 0.3
    conf = rng.randn(b, num_p, NUM_CLASSES).astype(np.float32)

    gts = [_rand_gt(rng, rng.randint(1, 6)) for _ in range(b)]
    targets = [torch.from_numpy(
        np.concatenate([g[0], g[1][:, None].astype(np.float32)], 1))
        for g in gts]

    crit = REF.MultiBoxLoss(NUM_CLASSES, 0.5, True, 0, True, 3, 0.5,
                            False, use_gpu=False)
    ref_l, ref_c = crit.forward(
        (torch.from_numpy(loc), torch.from_numpy(conf),
         torch.from_numpy(priors)), targets)
    capsys.readouterr()  # swallow the reference's stray prints

    max_boxes = max(len(g[0]) for g in gts)
    gt_boxes = np.zeros((b, max_boxes, 4), np.float32)
    gt_labels = np.zeros((b, max_boxes), np.int32)
    gt_valid = np.zeros((b, max_boxes), bool)
    for i, (bx, lb) in enumerate(gts):
        gt_boxes[i, : len(bx)] = bx
        gt_labels[i, : len(lb)] = lb
        gt_valid[i, : len(lb)] = True

    out = multibox_loss((loc, conf, priors), gt_boxes, gt_labels, gt_valid,
                        num_classes=NUM_CLASSES, variances=VARIANCES)
    np.testing.assert_allclose(float(out.loss_l), float(ref_l), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(float(out.loss_c), float(ref_c), rtol=2e-5,
                               atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_legacy_detect_parity(seed):
    rng = np.random.RandomState(seed)
    num_p = 400
    top_k = 50
    priors = _priors(num_p)
    b = 2
    loc = rng.randn(b, num_p, 4).astype(np.float32) * 0.4
    # softmaxed scores, like the SSD test phase feeds Detect
    logits = rng.randn(b, num_p, NUM_CLASSES).astype(np.float32) * 2.0
    conf = torch.softmax(torch.from_numpy(logits), dim=-1).numpy()

    det = REF.Detect(NUM_CLASSES, "300", 0, top_k, conf_thresh=0.05,
                     nms_thresh=0.45)
    ref_out = det.forward(torch.from_numpy(loc), torch.from_numpy(conf),
                          torch.from_numpy(priors)).numpy()

    cfg = DetectConfig(num_classes=NUM_CLASSES, top_k=top_k,
                       conf_thresh=0.05, nms_thresh=0.45,
                       variance=VARIANCES)
    mine = np.asarray(detect_ssd(loc, conf, priors, cfg))

    assert mine.shape == ref_out.shape == (b, NUM_CLASSES, top_k, 5)
    np.testing.assert_allclose(mine, ref_out, atol=1e-5)
