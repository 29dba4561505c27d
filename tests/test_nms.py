import numpy as np
import jax.numpy as jnp

from refinedet_tpu.ops import nms, batched_nms, soft_nms
from oracles import np_greedy_nms
from test_boxes import random_boxes


def _dets(rng, n, scale=300.0):
    boxes = random_boxes(rng, n, scale=scale)
    scores = rng.uniform(0.01, 1.0, size=n).astype(np.float32)
    return boxes, scores


def test_nms_matches_oracle_no_plus_one(rng):
    for _ in range(5):
        boxes, scores = _dets(rng, 60)
        res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, top_k=60)
        got = sorted(np.asarray(res.indices)[np.asarray(res.keep)].tolist())
        dets = np.hstack([boxes, scores[:, None]])
        want = sorted(np_greedy_nms(dets, 0.45, plus_one=False))
        assert got == want


def test_nms_matches_oracle_plus_one(rng):
    # +1 pixel-area convention: C/CUDA NMS parity (cpu_nms.pyx:24).
    for _ in range(5):
        boxes, scores = _dets(rng, 50)
        res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.49, top_k=50,
                  plus_one=True)
        got = sorted(np.asarray(res.indices)[np.asarray(res.keep)].tolist())
        dets = np.hstack([boxes, scores[:, None]])
        want = sorted(np_greedy_nms(dets, 0.49, plus_one=True))
        assert got == want


def test_nms_keep_order_is_score_descending(rng):
    boxes, scores = _dets(rng, 40)
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, top_k=40)
    kept_scores = np.asarray(res.scores)[np.asarray(res.keep)]
    assert (np.diff(kept_scores) <= 1e-6).all()


def test_nms_score_threshold_excludes(rng):
    boxes, scores = _dets(rng, 30)
    scores[:15] = 0.001
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, top_k=30,
              score_thresh=0.01)
    kept_idx = np.asarray(res.indices)[np.asarray(res.keep)]
    assert (kept_idx >= 15).all()


def test_nms_top_k_truncates(rng):
    boxes, scores = _dets(rng, 100)
    res = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.99, top_k=10)
    assert res.indices.shape == (10,)
    # with thresh ~1 nothing suppressed: all 10 candidates kept
    assert int(res.keep.sum()) == 10


def test_batched_nms_classes_independent(rng):
    boxes, s0 = _dets(rng, 25)
    _, s1 = _dets(rng, 25)
    scores = np.stack([s0, s1])
    res = batched_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45,
                      top_k=25)
    for c, s in enumerate((s0, s1)):
        single = nms(jnp.asarray(boxes), jnp.asarray(s), 0.45, top_k=25)
        np.testing.assert_array_equal(np.asarray(res.keep[c]),
                                      np.asarray(single.keep))


def test_soft_nms_matches_native_cython_semantics(rng):
    """XLA soft-NMS == native C++ (Cython-equivalent) on random boxes:
    same kept-box set and same rescored scores — the selection must be
    current-max order, not original-score order."""
    from refinedet_tpu.ops import nms_native
    if nms_native._load_lib() is None:
        pytest.skip("native NMS library unavailable")
    import jax.numpy as jnp
    for trial in range(5):
        r = np.random.RandomState(trial)
        n = 40
        xy = r.uniform(0, 80, (n, 2)).astype(np.float32)
        wh = r.uniform(10, 60, (n, 2)).astype(np.float32)
        boxes = np.hstack([xy, xy + wh]).astype(np.float32)
        scores = r.uniform(0.05, 1.0, n).astype(np.float32)

        res = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                       iou_thresh=0.3, score_thresh=0.2, method="linear",
                       top_k=n)
        kept_idx = np.asarray(res.indices)[np.asarray(res.keep)]
        ours = {tuple(boxes[i]): float(np.asarray(res.scores)[j])
                for j, i in zip(np.nonzero(np.asarray(res.keep))[0],
                                kept_idx)}

        dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
        keep_nat = nms_native.soft_nms(dets, iou_thresh=0.3,
                                       score_thresh=0.2, method="linear")
        theirs = {tuple(dets[i, :4]): float(dets[i, 4]) for i in keep_nat}

        assert set(ours) == set(theirs), f"trial {trial}: keep sets differ"
        for k in ours:
            np.testing.assert_allclose(ours[k], theirs[k], rtol=1e-5)


def test_soft_nms_decays_overlapping(rng):
    # Two heavily overlapping boxes: the weaker one's score decays.
    boxes = np.array([[10, 10, 100, 100], [12, 12, 102, 102],
                      [200, 200, 250, 250]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    res = soft_nms(jnp.asarray(boxes), jnp.asarray(scores), method="linear",
                   top_k=3)
    out = np.asarray(res.scores)
    assert out[0] == 0.9
    assert out[1] < 0.8 * 0.3          # heavy decay
    assert abs(out[2] - 0.7) < 1e-4    # isolated box untouched
