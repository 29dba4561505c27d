import numpy as np
import jax.numpy as jnp

from refinedet_tpu.boxes import match, refine_match
from refinedet_tpu.boxes.matcher import refine_match_batch
from oracles import np_center_size, np_match
from test_boxes import random_boxes

VAR = (0.1, 0.2)
THRESH = 0.5


def _pad(truths, labels, max_boxes):
    m = len(truths)
    t = np.zeros((max_boxes, 4), np.float32)
    l = np.zeros((max_boxes,), np.int32)
    v = np.zeros((max_boxes,), bool)
    t[:m], l[:m], v[:m] = truths, labels, True
    return t, l, v


def _random_problem(rng, num_gt=5, num_priors=200):
    truths = random_boxes(rng, num_gt)
    labels = rng.randint(0, 20, size=num_gt).astype(np.int32)
    priors_cs = np_center_size(random_boxes(rng, num_priors)).astype(np.float32)
    return truths, labels, priors_cs


def test_match_matches_oracle(rng):
    for _ in range(5):
        truths, labels, priors = _random_problem(rng)
        want_loc, want_conf = np_match(THRESH, truths, priors, VAR, labels,
                                       label_offset=1)
        t, l, v = _pad(truths, labels, 16)
        got = match(jnp.asarray(t), jnp.asarray(l), jnp.asarray(v),
                    jnp.asarray(priors), VAR, THRESH)
        np.testing.assert_array_equal(np.asarray(got.conf_t), want_conf)
        np.testing.assert_allclose(np.asarray(got.loc_t), want_loc, atol=1e-3)


def test_refine_match_arm_mode_matches_oracle(rng):
    truths, labels, priors = _random_problem(rng, num_gt=7)
    bin_labels = np.ones_like(labels)  # ARM binary objectness labels
    want_loc, want_conf = np_match(THRESH, truths, priors, VAR, bin_labels,
                                   label_offset=0)
    t, l, v = _pad(truths, bin_labels, 12)
    got = refine_match(jnp.asarray(t), jnp.asarray(l), jnp.asarray(v),
                       jnp.asarray(priors), VAR, THRESH)
    np.testing.assert_array_equal(np.asarray(got.conf_t), want_conf)
    np.testing.assert_allclose(np.asarray(got.loc_t), want_loc, atol=1e-3)


def test_refine_match_odm_mode_matches_oracle(rng):
    truths, labels, priors = _random_problem(rng, num_gt=4)
    labels = labels + 1  # 1-based foreground labels (sarship convention)
    arm_loc = (rng.randn(len(priors), 4) * 0.3).astype(np.float32)
    want_loc, want_conf = np_match(THRESH, truths, priors, VAR, labels,
                                   label_offset=0, arm_loc=arm_loc)
    t, l, v = _pad(truths, labels, 8)
    got = refine_match(jnp.asarray(t), jnp.asarray(l), jnp.asarray(v),
                       jnp.asarray(priors), VAR, THRESH,
                       jnp.asarray(arm_loc))
    np.testing.assert_array_equal(np.asarray(got.conf_t), want_conf)
    np.testing.assert_allclose(np.asarray(got.loc_t), want_loc, atol=1e-3)


def test_forced_assignment_last_gt_wins():
    # Two GTs whose best anchor is the same prior: reference's sequential
    # overwrite loop means GT index 1 wins (box_utils.py:104-105).
    priors = np.array([[0.5, 0.5, 0.2, 0.2],
                       [0.9, 0.9, 0.1, 0.1]], np.float32)
    truths = np.array([[0.42, 0.42, 0.58, 0.58],
                       [0.40, 0.40, 0.60, 0.60]], np.float32)
    labels = np.array([3, 7], np.int32)
    t, l, v = _pad(truths, labels, 4)
    got = match(jnp.asarray(t), jnp.asarray(l), jnp.asarray(v),
                jnp.asarray(priors), VAR, THRESH)
    assert int(got.conf_t[0]) == 8  # GT 1 (label 7) + 1 offset
    want_loc, want_conf = np_match(THRESH, truths, priors, VAR, labels)
    np.testing.assert_array_equal(np.asarray(got.conf_t), want_conf)


def test_padding_rows_do_not_affect_result(rng):
    truths, labels, priors = _random_problem(rng)
    t8, l8, v8 = _pad(truths, labels, 8)
    t64, l64, v64 = _pad(truths, labels, 64)
    # Poison the padding rows: must not change anything.
    t64[len(truths):] = 0.77
    l64[len(truths):] = 19
    got8 = match(jnp.asarray(t8), jnp.asarray(l8), jnp.asarray(v8),
                 jnp.asarray(priors), VAR, THRESH)
    got64 = match(jnp.asarray(t64), jnp.asarray(l64), jnp.asarray(v64),
                  jnp.asarray(priors), VAR, THRESH)
    np.testing.assert_array_equal(np.asarray(got8.conf_t),
                                  np.asarray(got64.conf_t))
    np.testing.assert_allclose(np.asarray(got8.loc_t),
                               np.asarray(got64.loc_t), atol=1e-6)


def test_no_valid_gt_all_background():
    priors = np.array([[0.5, 0.5, 0.2, 0.2]], np.float32)
    t = np.zeros((4, 4), np.float32)
    l = np.zeros((4,), np.int32)
    v = np.zeros((4,), bool)
    got = match(jnp.asarray(t), jnp.asarray(l), jnp.asarray(v),
                jnp.asarray(priors), VAR, THRESH)
    assert int(got.conf_t[0]) == 0
    assert np.all(np.isfinite(np.asarray(got.loc_t)))


def test_batch_vmap_consistency(rng):
    priors = np_center_size(random_boxes(rng, 100)).astype(np.float32)
    batch_t, batch_l, batch_v = [], [], []
    for n in (1, 3, 6):
        truths = random_boxes(rng, n)
        labels = rng.randint(1, 3, size=n).astype(np.int32)
        t, l, v = _pad(truths, labels, 8)
        batch_t.append(t); batch_l.append(l); batch_v.append(v)
    bt = jnp.asarray(np.stack(batch_t))
    bl = jnp.asarray(np.stack(batch_l))
    bv = jnp.asarray(np.stack(batch_v))
    got = refine_match_batch(bt, bl, bv, jnp.asarray(priors), VAR, THRESH)
    for i in range(3):
        single = refine_match(bt[i], bl[i], bv[i], jnp.asarray(priors),
                              VAR, THRESH)
        np.testing.assert_array_equal(np.asarray(got.conf_t[i]),
                                      np.asarray(single.conf_t))
