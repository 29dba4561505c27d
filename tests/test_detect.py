import numpy as np
import jax
import jax.numpy as jnp

from refinedet_tpu.config import DetectConfig
from refinedet_tpu.detect import (cascade_decode, detect_refinedet,
                                  detect_refinedet_nms, filter_objectness)
from oracles import np_center_size, np_decode, np_greedy_nms
from test_boxes import random_boxes

VAR = (0.1, 0.2)


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _inputs(rng, b=2, p=80, c=5):
    arm_loc = (rng.randn(b, p, 4) * 0.2).astype(np.float32)
    arm_conf = _softmax(rng.randn(b, p, 2).astype(np.float32), 2)
    odm_loc = (rng.randn(b, p, 4) * 0.2).astype(np.float32)
    odm_conf = _softmax(rng.randn(b, p, c).astype(np.float32), 2)
    priors = np_center_size(random_boxes(rng, p)).astype(np.float32)
    return arm_loc, arm_conf, odm_loc, odm_conf, priors


def test_cascade_decode_matches_oracle(rng):
    arm_loc, _, odm_loc, _, priors = _inputs(rng, b=1)
    got = np.asarray(cascade_decode(jnp.asarray(arm_loc[0]),
                                    jnp.asarray(odm_loc[0]),
                                    jnp.asarray(priors), VAR))
    refined = np_center_size(np_decode(arm_loc[0], priors, VAR))
    want = np_decode(odm_loc[0], refined, VAR)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_objectness_filter_zeroes_all_classes(rng):
    arm_loc, arm_conf, odm_loc, odm_conf, priors = _inputs(rng)
    arm_conf[0, :10, 1] = 0.001  # low objectness on first 10 anchors
    arm_conf[0, :10, 0] = 0.999
    _, scores = detect_refinedet(*map(jnp.asarray,
                                      (arm_loc, arm_conf, odm_loc,
                                       odm_conf, priors)),
                                 objectness_thresh=0.01)
    s = np.asarray(scores)
    assert (s[0, :10] == 0).all()       # every class zeroed, incl. bkg
    assert (s[0, 10:] > 0).any()


def test_detect_refinedet_shapes(rng):
    inp = _inputs(rng, b=3, p=60, c=7)
    boxes, scores = detect_refinedet(*map(jnp.asarray, inp))
    assert boxes.shape == (3, 60, 4)
    assert scores.shape == (3, 60, 7)


def test_detect_nms_against_oracle(rng):
    arm_loc, arm_conf, odm_loc, odm_conf, priors = _inputs(rng, b=1, p=50,
                                                           c=3)
    cfg = DetectConfig(num_classes=3, top_k=50, keep_top_k=50,
                       conf_thresh=0.01, nms_thresh=0.45,
                       objectness_thresh=0.01)
    out = np.asarray(detect_refinedet_nms(
        *map(jnp.asarray, (arm_loc, arm_conf, odm_loc, odm_conf, priors)),
        cfg))
    assert out.shape == (1, 3, 50, 5)
    assert (out[0, 0] == 0).all()  # background row empty

    # Oracle: manual decode + per-class greedy NMS (no +1 area).
    boxes_j, scores_j = detect_refinedet(
        *map(jnp.asarray, (arm_loc, arm_conf, odm_loc, odm_conf, priors)))
    boxes = np.asarray(boxes_j[0])
    scores = np.asarray(scores_j[0])
    for cl in range(1, 3):
        valid = scores[:, cl] > cfg.conf_thresh
        dets = np.hstack([boxes, scores[:, cl:cl + 1]])
        keep = [i for i in np_greedy_nms(dets, cfg.nms_thresh,
                                         plus_one=False) if valid[i]]
        want_scores = np.sort(scores[keep, cl])[::-1]
        got_rows = out[0, cl]
        got_scores = got_rows[got_rows[:, 0] > 0, 0]
        np.testing.assert_allclose(got_scores, want_scores, atol=1e-6)


def test_detect_nms_is_jittable(rng):
    inp = _inputs(rng, b=1, p=40, c=3)
    cfg = DetectConfig(num_classes=3, top_k=40)
    fn = jax.jit(lambda *a: detect_refinedet_nms(*a, cfg))
    out = fn(*map(jnp.asarray, inp))
    assert out.shape == (1, 3, 40, 5)


def test_detect_nms_keep_top_k_cap(rng):
    inp = _inputs(rng, b=1, p=50, c=3)
    cfg = DetectConfig(num_classes=3, top_k=50, keep_top_k=5,
                       conf_thresh=0.01, nms_thresh=0.99)
    out = np.asarray(detect_refinedet_nms(
        *map(jnp.asarray, inp), cfg, apply_keep_top_k=True))
    nonzero = (out[0, :, :, 0] > 0).sum()
    assert nonzero <= 5
    # without the cap (reference's inert behavior) more survive
    out2 = np.asarray(detect_refinedet_nms(*map(jnp.asarray, inp), cfg))
    assert (out2[0, :, :, 0] > 0).sum() > 5
