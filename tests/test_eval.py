import numpy as np
import pytest

from refinedet_tpu.eval.voc_eval import voc_ap, voc_eval_class
from refinedet_tpu.eval import evaluate_voc, write_voc_results_files


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)
    assert voc_ap(rec, prec, use_07_metric=False) == pytest.approx(1.0)


def test_voc_eval_class_basic():
    gt = {"img1": {"bbox": [[10, 10, 50, 50], [60, 60, 90, 90]],
                   "difficult": [False, False]}}
    # one TP, one FP, one GT missed
    dets = [("img1", 0.9, np.array([11, 11, 49, 49])),
            ("img1", 0.8, np.array([200, 200, 240, 240]))]
    rec, prec, ap = voc_eval_class(dets, gt, use_07_metric=False)
    assert rec[-1] == pytest.approx(0.5)
    assert prec[0] == pytest.approx(1.0)
    assert ap == pytest.approx(0.5)


def test_voc_eval_difficult_ignored():
    gt = {"img1": {"bbox": [[10, 10, 50, 50]], "difficult": [True]}}
    dets = [("img1", 0.9, np.array([11, 11, 49, 49]))]
    rec, prec, ap = voc_eval_class(dets, gt, use_07_metric=False)
    # difficult GT: detection neither TP nor FP; npos 0
    assert ap == 0.0


def test_voc_eval_duplicate_detection_is_fp():
    gt = {"img1": {"bbox": [[10, 10, 50, 50]], "difficult": [False]}}
    dets = [("img1", 0.9, np.array([11, 11, 49, 49])),
            ("img1", 0.8, np.array([12, 12, 48, 48]))]
    rec, prec, ap = voc_eval_class(dets, gt, use_07_metric=False)
    assert rec[-1] == pytest.approx(1.0)
    assert prec[-1] == pytest.approx(0.5)


class _StubVOC:
    """Two images, two classes; class 0 in both images."""

    def __init__(self):
        self.ids = [("root", "im0"), ("root", "im1")]
        self._anno = {
            0: ("im0", np.array([[10., 10, 50, 50]]), np.array([0]),
                np.array([False])),
            1: ("im1", np.array([[20., 20, 60, 60], [5., 5, 15, 15]]),
                np.array([0, 1]), np.array([False, False])),
        }

    def __len__(self):
        return 2

    def pull_anno_full(self, i):
        return self._anno[i]


def test_evaluate_voc_end_to_end(tmp_path):
    ds = _StubVOC()
    classes = ("cat", "dog")
    # all_boxes[class_1based][img] = [N,5]
    empty = np.empty((0, 5))
    perfect_c0 = [
        np.array([[10, 10, 50, 50, 0.95]]),
        np.array([[20, 20, 60, 60, 0.9]]),
    ]
    miss_c1 = [empty, empty]
    all_boxes = [None, perfect_c0, miss_c1]
    aps = evaluate_voc(all_boxes, ds, classes, verbose=False)
    assert aps["cat"] == pytest.approx(1.0)
    assert aps["dog"] == pytest.approx(0.0)
    assert aps["mAP"] == pytest.approx(0.5)

    paths = write_voc_results_files(all_boxes, ["im0", "im1"], classes,
                                    str(tmp_path))
    with open(paths["cat"]) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 2
    assert lines[0].startswith("im0 0.950 11.0 11.0 51.0 51.0")


def test_evaluator_plumbing(tmp_path):
    """Random-weight model through the full Evaluator on a synthetic
    dataset: shapes, FPS report, COCO stats."""
    import jax
    from data_fixtures import make_coco_dataset
    from refinedet_tpu.config import DetectConfig
    from refinedet_tpu.data import BaseTransform, COCODetection
    from refinedet_tpu.eval import Evaluator
    from refinedet_tpu.models import build_refinedet

    root = str(tmp_path)
    make_coco_dataset(root, split="test", num_images=3, img_size=64)
    ds = COCODetection(root, [("sarship", "test")], None)
    model = build_refinedet("test", 320, 2)
    variables = model.init(jax.random.PRNGKey(0))
    cfg = DetectConfig(num_classes=2, top_k=50, keep_top_k=50)
    ev = Evaluator(model, ds, cfg, BaseTransform(320, (98.1,) * 3),
                   batch_size=2, nms_top_k=50, log=lambda s: None)
    all_boxes = ev.run(variables)
    assert len(all_boxes) == 2 and len(all_boxes[1]) == 3
    for rows in all_boxes[1]:
        assert rows.shape[1] == 5
    assert ev.timing["fps"] > 0
    stats = ds.evaluate_detections(all_boxes, None)
    assert stats.shape == (12,)


# ---------------------------------------------------------------------------
# COCOeval golden fixtures (round-1 verdict item #3): hand-constructed GT/DT
# sets with hand-computed AP/AR, pinning the pycocotools protocol semantics
# the reference's acceptance metric depends on
# (/root/reference/data/sarship_coco.py:279-291): iscrowd IoU =
# intersection/det-area, area-range ignore, maxDets truncation, and the
# 101-point interpolation boundary.
# ---------------------------------------------------------------------------

def _coco_pair(gts, dts, num_cats=1, img_size=1000):
    """Build (cocoGt, cocoDt) from compact ann specs.

    gts: list of (img_id, cat_id, [x,y,w,h], iscrowd)
    dts: list of (img_id, cat_id, [x,y,w,h], score)
    """
    from refinedet_tpu.data.coco_io import COCO

    img_ids = sorted({g[0] for g in gts} | {d[0] for d in dts}) or [1]
    dataset = {
        "images": [{"id": i, "width": img_size, "height": img_size}
                   for i in img_ids],
        "categories": [{"id": c, "name": f"c{c}"}
                       for c in range(1, num_cats + 1)],
        "annotations": [
            {"id": i + 1, "image_id": g[0], "category_id": g[1],
             "bbox": list(map(float, g[2])),
             "area": float(g[2][2] * g[2][3]), "iscrowd": g[3]}
            for i, g in enumerate(gts)],
    }
    gt = COCO(dataset)
    dt = gt.loadRes([
        {"image_id": d[0], "category_id": d[1],
         "bbox": list(map(float, d[2])), "score": float(d[3])}
        for d in dts])
    return gt, dt


def _run_eval(gts, dts, **kw):
    from refinedet_tpu.eval.coco_eval import COCOeval

    gt, dt = _coco_pair(gts, dts, **kw)
    e = COCOeval(gt, dt)
    e.evaluate()
    e.accumulate()
    return e.summarize()


def test_cocoeval_golden_perfect_single():
    """One exact TP. AP = AP50 = AP75 = 1; GT is 'small' (area 100), so
    medium/large have no GT -> -1 sentinel."""
    stats = _run_eval(gts=[(1, 1, (0, 0, 10, 10), 0)],
                      dts=[(1, 1, (0, 0, 10, 10), 0.9)])
    np.testing.assert_allclose(stats[:4], [1, 1, 1, 1])
    assert stats[4] == -1 and stats[5] == -1  # no medium/large GT
    np.testing.assert_allclose(stats[6:10], [1, 1, 1, 1])


def test_cocoeval_golden_high_score_fp():
    """A far-away FP scored ABOVE the TP halves interpolated precision:
    pr=[0, 1/2] -> monotone [1/2, 1/2] -> AP 0.5. AR unaffected (=1)."""
    stats = _run_eval(
        gts=[(1, 1, (0, 0, 10, 10), 0)],
        dts=[(1, 1, (0, 0, 10, 10), 0.8),
             (1, 1, (500, 500, 10, 10), 0.95)])
    np.testing.assert_allclose(stats[0], 0.5)
    np.testing.assert_allclose(stats[1], 0.5)  # same at every IoU thr
    np.testing.assert_allclose(stats[8], 1.0)  # AR@100


def test_cocoeval_golden_iou_threshold_switch():
    """DT covers 6/10 of the GT: IoU = 60/(100+60-60) = 0.6 exactly.
    TP at thresholds {0.50,0.55,0.60}, FP above -> AP = 3/10,
    AP50 = 1, AP75 = 0, AR = 0.3."""
    stats = _run_eval(gts=[(1, 1, (0, 0, 10, 10), 0)],
                      dts=[(1, 1, (0, 0, 10, 6), 0.9)])
    np.testing.assert_allclose(stats[0], 0.3)
    np.testing.assert_allclose(stats[1], 1.0)
    np.testing.assert_allclose(stats[2], 0.0)
    np.testing.assert_allclose(stats[8], 0.3)


def test_cocoeval_golden_iscrowd_det_area_iou():
    """Crowd IoU = intersection / det-area. A det fully inside a crowd
    region (normal IoU 100/400 = 0.25 < 0.5, crowd IoU = 1.0) must match
    the crowd GT and be IGNORED, not counted FP. It outscores the real TP,
    so a union-IoU bug would drop AP to 0.5; correct AP = 1."""
    stats = _run_eval(
        gts=[(1, 1, (0, 0, 10, 10), 0),
             (1, 1, (50, 50, 20, 20), 1)],   # iscrowd
        dts=[(1, 1, (0, 0, 10, 10), 0.9),
             (1, 1, (55, 55, 10, 10), 0.95)])  # inside the crowd box
    np.testing.assert_allclose(stats[0], 1.0)
    np.testing.assert_allclose(stats[1], 1.0)


def test_cocoeval_golden_area_range_ignore():
    """Small GT (100 px^2) + large GT (10000 px^2), each detected exactly;
    the large det outscores the small one. In the 'small' range the large
    GT and its matched det are ignored (AP_small = 1; broken ignore logic
    would score its det as a leading FP -> 0.5). Same mirrored for
    'large'. An unmatched det whose area is outside the range is ignored
    too, not an FP."""
    stats = _run_eval(
        gts=[(1, 1, (0, 0, 10, 10), 0),
             (1, 1, (200, 200, 100, 100), 0)],
        dts=[(1, 1, (0, 0, 10, 10), 0.9),
             (1, 1, (200, 200, 100, 100), 0.95),
             (1, 1, (600, 600, 200, 200), 0.7)])  # unmatched, area 40000
    np.testing.assert_allclose(stats[0], 1.0)   # AP all
    np.testing.assert_allclose(stats[3], 1.0)   # AP small
    assert stats[4] == -1                       # no medium GT
    np.testing.assert_allclose(stats[5], 1.0)   # AP large
    np.testing.assert_allclose(stats[9], 1.0)   # AR small
    np.testing.assert_allclose(stats[11], 1.0)  # AR large


def test_cocoeval_golden_maxdets_truncation():
    """Two leading FPs then the TP (score order). AR@1 sees only the top
    FP -> 0; AR@10/AR@100 reach the TP -> 1. AP (maxDets=100):
    pr=[0,0,1/3] -> monotone 1/3 everywhere -> exactly 1/3."""
    stats = _run_eval(
        gts=[(1, 1, (0, 0, 10, 10), 0)],
        dts=[(1, 1, (500, 0, 10, 10), 0.9),
             (1, 1, (0, 500, 10, 10), 0.8),
             (1, 1, (0, 0, 10, 10), 0.7)])
    np.testing.assert_allclose(stats[0], 1 / 3)
    np.testing.assert_allclose(stats[6], 0.0)  # AR@1
    np.testing.assert_allclose(stats[7], 1.0)  # AR@10
    np.testing.assert_allclose(stats[8], 1.0)  # AR@100


def test_cocoeval_golden_interpolation_boundary():
    """2 GTs, 1 TP -> recall 0.5 lands exactly on a recThrs grid point.
    searchsorted side='left' includes it: precision 1.0 for the 51
    thresholds 0.00..0.50, 0 above -> AP = 51/101 exactly."""
    stats = _run_eval(
        gts=[(1, 1, (0, 0, 10, 10), 0),
             (1, 1, (100, 100, 10, 10), 0)],
        dts=[(1, 1, (0, 0, 10, 10), 0.9)])
    np.testing.assert_allclose(stats[0], 51 / 101)
    np.testing.assert_allclose(stats[1], 51 / 101)
    np.testing.assert_allclose(stats[8], 0.5)


def test_cocoeval_golden_multicategory_mean():
    """Category averaging: cat1 perfect (AP 1), cat2 has GT but zero dets
    (AP 0, not excluded) -> mAP = 0.5."""
    stats = _run_eval(
        gts=[(1, 1, (0, 0, 10, 10), 0),
             (1, 2, (100, 100, 10, 10), 0)],
        dts=[(1, 1, (0, 0, 10, 10), 0.9)],
        num_cats=2)
    np.testing.assert_allclose(stats[0], 0.5)
    np.testing.assert_allclose(stats[1], 0.5)
    np.testing.assert_allclose(stats[8], 0.5)  # AR averages the same way
