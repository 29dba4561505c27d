"""VOC evaluator parity against the ACTUAL reference voc_eval.

Drives the reference's file-based evaluation chain
(/root/reference/eval_refinedet_voc.py:230-363) — result-file parsing,
XML annotation cache, per-class greedy matching, difficult handling,
both AP metrics — on a synthetic VOCdevkit + random detections, and pins
our in-memory evaluator (refinedet_tpu/eval/voc_eval.py) to it exactly.

Two reference quirks are covered deliberately:
  * this fork's voc_eval drops the VOC devkit's +1-pixel area convention
    (eval_refinedet_voc.py:330-336);
  * the chain inherits ssd.pytorch's off-by-one — result files are
    written 1-based (:160-162) while parse_rec converts GT back to
    0-based (:117-120) — reproduced via evaluate_voc's det_shift=1.
"""

import importlib.util
import os.path as osp
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

from reference_modules import load_reference, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("/root/reference not mounted", allow_module_level=True)

load_reference()  # installs fakes + sys.path for the reference tree

from data_fixtures import make_voc_dataset  # noqa: E402
from refinedet_tpu.data.voc import VOCDetection  # noqa: E402
from refinedet_tpu.eval.voc_eval import (  # noqa: E402
    evaluate_voc, voc_eval_class, write_voc_results_files)

# the first three VOC_CLASSES in order, so the dataset's label indices
# align with positions in this tuple
CLASSES = ("aeroplane", "bicycle", "bird")


@pytest.fixture(scope="module")
def ref_eval_mod(tmp_path_factory):
    """Import the reference eval driver (module-level argparse needs a
    patched argv; --save_folder must be creatable).

    Loaded BY FILE PATH under a private module name: this repo has its own
    eval_refinedet_voc.py at the root, so ``import eval_refinedet_voc``
    resolves by sys.path order — which other tests legitimately reshuffle
    (anything importing this repo's root drivers). A name-based import
    here once picked up OUR driver instead of the reference's."""
    save = tmp_path_factory.mktemp("ref_save")
    argv = sys.argv
    sys.argv = ["eval_refinedet_voc.py", "--cuda", "False",
                "--save_folder", str(save), "--voc_root", str(save)]
    try:
        spec = importlib.util.spec_from_file_location(
            "_reference_eval_refinedet_voc",
            osp.join("/root/reference", "eval_refinedet_voc.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod


@pytest.fixture(scope="module")
def voc_setup(tmp_path_factory):
    """Synthetic VOCdevkit (with difficult objects) + random detections
    in the reference all_boxes layout."""
    root = str(tmp_path_factory.mktemp("voc"))
    ids = make_voc_dataset(root, year="2007", image_set="test",
                           num_images=10, img_size=140, seed=3,
                           classes=CLASSES, difficult_prob=0.3)
    ds = VOCDetection(root, [("2007", "test")], None)

    rng = np.random.RandomState(7)
    # Collect (image_index, box) per class first; coords are rounded to
    # 1 decimal and scores assigned as UNIQUE 3-decimal values so the
    # result-file round-trip (%.1f coords, %.3f scores,
    # write_voc_results_files) is lossless and score ties — which the
    # reference's unstable argsort and our stable mergesort would break
    # differently — cannot occur.
    per_class = [[] for _ in CLASSES]
    for i in range(len(ds)):
        _, gt_boxes, gt_labels0, _ = ds.pull_anno_full(i)
        for ci in range(len(CLASSES)):
            # jittered copies of this class's GT (TPs and near misses)
            # + an exact duplicate (exercises double-detection FP logic)
            for b, l0 in zip(gt_boxes, gt_labels0):
                if l0 != ci:
                    continue
                for _ in range(2):
                    per_class[ci].append((i, b + rng.uniform(-6, 6, 4)))
                per_class[ci].append((i, b.copy()))
            for _ in range(rng.randint(1, 4)):  # pure-noise negatives
                x1, y1 = rng.uniform(0, 90, 2)
                w, h = rng.uniform(10, 40, 2)
                per_class[ci].append(
                    (i, np.array([x1, y1, x1 + w, y1 + h])))

    all_boxes = [[np.zeros((0, 5), np.float32) for _ in ids]
                 for _ in range(len(CLASSES) + 1)]
    for ci, entries in enumerate(per_class):
        n = len(entries)
        scores = rng.permutation(
            np.round(np.linspace(0.95, 0.05, n), 3))
        assert len(np.unique(scores)) == n
        rows = [[] for _ in ids]
        for (i, box), s in zip(entries, scores):
            rows[i].append(np.concatenate([np.round(box, 1), [s]]))
        for i in range(len(ids)):
            if rows[i]:
                all_boxes[ci + 1][i] = np.asarray(rows[i], np.float32)
    return root, ids, ds, all_boxes


@pytest.mark.parametrize("use_07", [True, False])
def test_voc_eval_chain_parity(voc_setup, ref_eval_mod, tmp_path,
                               monkeypatch, use_07):
    root, ids, ds, all_boxes = voc_setup
    # the reference's voc_eval uses the np.bool alias (:317) — removed in
    # numpy 1.24, restored in 2.0; shim it only if absent
    if not hasattr(np, "bool"):
        monkeypatch.setattr(np, "bool", np.bool_, raising=False)

    det_dir = str(tmp_path / "dets")
    write_voc_results_files(all_boxes, ids, CLASSES, det_dir)
    detpath = osp.join(det_dir, "comp4_det_test_{:s}.txt")
    annopath = osp.join(root, "VOC2007", "Annotations", "%s.xml")
    imagesetfile = osp.join(root, "VOC2007", "ImageSets", "Main",
                            "test.txt")
    cachedir = str(tmp_path / f"cache{int(use_07)}")

    ours = evaluate_voc(all_boxes, ds, CLASSES, use_07_metric=use_07,
                        verbose=False)
    for cls_ind, cls in enumerate(CLASSES):
        ref_rec, ref_prec, ref_ap = ref_eval_mod.voc_eval(
            detpath, annopath, imagesetfile, cls, cachedir,
            ovthresh=0.5, use_07_metric=use_07)
        np.testing.assert_allclose(ours[cls], ref_ap, atol=1e-12,
                                   err_msg=f"AP mismatch for {cls}")

        # rec/prec curves too (via the class-level API + det_shift=1,
        # matching the file round-trip's coordinate offset)
        gts = {}
        for i in range(len(ds)):
            img_id, boxes, labels0, difficult = ds.pull_anno_full(i)
            sel = labels0 == cls_ind
            gts[str(img_id)] = {"bbox": boxes[sel],
                                "difficult": difficult[sel]}
        dets = []
        for i in range(len(ds)):
            rows = all_boxes[cls_ind + 1][i]
            for k in range(rows.shape[0]):
                dets.append((str(ds.ids[i][1]), float(rows[k, 4]),
                             rows[k, :4]))
        rec, prec, ap = voc_eval_class(dets, gts, 0.5, use_07,
                                       det_shift=1.0)
        np.testing.assert_allclose(ap, ref_ap, atol=1e-12)
        np.testing.assert_allclose(rec, ref_rec, atol=1e-12)
        np.testing.assert_allclose(prec, ref_prec, atol=1e-12)
