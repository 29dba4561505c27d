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
