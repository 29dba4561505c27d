import numpy as np
import pytest

from refinedet_tpu.ops import nms_native
from oracles import np_greedy_nms
from test_boxes import random_boxes


def _dets(rng, n):
    boxes = random_boxes(rng, n, scale=300.0)
    scores = rng.uniform(0.01, 1.0, size=n).astype(np.float32)
    return np.hstack([boxes, scores[:, None]]).astype(np.float32)


def test_native_lib_builds():
    assert nms_native._load_lib() is not None, \
        "native libnms.so failed to build"


@pytest.mark.parametrize("plus_one", [True, False])
def test_native_nms_matches_oracle(rng, plus_one):
    for _ in range(5):
        dets = _dets(rng, 80)
        got = nms_native.nms(dets, 0.49, plus_one=plus_one)
        want = np_greedy_nms(dets, 0.49, plus_one=plus_one)
        assert got == want  # same order (score-descending greedy)


def test_native_nms_empty():
    assert nms_native.nms(np.zeros((0, 5), np.float32), 0.5) == []


def test_numpy_fallback_matches_native(rng):
    dets = _dets(rng, 60)
    native = nms_native.nms(dets, 0.45)
    fallback = nms_native._numpy_nms(dets, 0.45, plus_one=True)
    assert native == fallback


def test_native_soft_nms_decays(rng):
    dets = np.array([[10, 10, 100, 100, 0.9],
                     [12, 12, 102, 102, 0.8],
                     [200, 200, 250, 250, 0.7]], np.float32)
    keep = nms_native.soft_nms(dets, method="linear", score_thresh=0.01)
    # strong overlap decays box 1 below box 2's score
    assert 0 in keep and 2 in keep
    assert dets[1, 4] < 0.1
    assert dets[2, 4] == pytest.approx(0.7, abs=1e-5)
