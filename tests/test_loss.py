import numpy as np
import jax.numpy as jnp

from refinedet_tpu.losses import refinedet_multibox_loss, multibox_loss
from oracles import np_center_size, np_match
from test_boxes import random_boxes
from test_matcher import _pad

VAR = (0.1, 0.2)
P = 120  # priors
M = 8    # max boxes
C = 4    # classes


def _np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_ce_rows(logits, targets):
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True))
                 .sum(-1)) + logits.max(-1)
    picked = np.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return lse - picked


def _np_smooth_l1(x):
    ax = np.abs(x)
    return np.where(ax < 1, 0.5 * ax * ax, ax - 0.5)


def np_refinedet_loss(arm_loc, arm_conf, odm_loc, odm_conf, priors,
                      per_image_targets, num_classes, use_arm,
                      thresh=0.5, negpos=3, theta=0.01):
    """Loop-style oracle of RefineDetMultiBoxLoss semantics."""
    b = arm_loc.shape[0]
    p = priors.shape[0]
    if use_arm:
        loc_data, conf_data = odm_loc, odm_conf
    else:
        loc_data, conf_data = arm_loc, arm_conf

    loc_t = np.zeros((b, p, 4), np.float32)
    conf_t = np.zeros((b, p), np.int64)
    for i, (boxes, labels) in enumerate(per_image_targets):
        if use_arm:
            lt, ct = np_match(thresh, boxes, priors, VAR, labels,
                              label_offset=0, arm_loc=arm_loc[i])
        else:
            lt, ct = np_match(thresh, boxes, priors, VAR,
                              np.ones_like(labels), label_offset=0)
        loc_t[i], conf_t[i] = lt, ct

    pos = conf_t > 0
    if use_arm:
        arm_obj = _np_softmax(arm_conf, 2)[:, :, 1]
        pos = pos & (arm_obj > theta)

    loss_l = _np_smooth_l1(loc_data - loc_t)[pos].sum()

    ce = _np_ce_rows(conf_data, conf_t)
    mining = np.where(pos, 0.0, ce)
    order = np.argsort(-mining, axis=1, kind="stable")
    rank = np.argsort(order, axis=1, kind="stable")
    num_pos = pos.sum(1)
    num_neg = np.minimum(negpos * num_pos, p - 1)
    neg = rank < num_neg[:, None]
    loss_c = ce[pos | neg].sum()

    n = float(num_pos.sum())
    if n < 1:
        return 0.0, 0.0
    return loss_l / n, loss_c / n


def _make_inputs(rng, b=3):
    arm_loc = (rng.randn(b, P, 4) * 0.2).astype(np.float32)
    arm_conf = rng.randn(b, P, 2).astype(np.float32)
    odm_loc = (rng.randn(b, P, 4) * 0.2).astype(np.float32)
    odm_conf = rng.randn(b, P, C).astype(np.float32)
    priors = np_center_size(random_boxes(rng, P)).astype(np.float32)
    targets, bt, bl, bv = [], [], [], []
    for i in range(b):
        n = rng.randint(1, M - 1)
        boxes = random_boxes(rng, n)
        labels = rng.randint(1, C, size=n).astype(np.int32)
        targets.append((boxes, labels))
        t, l, v = _pad(boxes, labels, M)
        bt.append(t); bl.append(l); bv.append(v)
    batch = (np.stack(bt), np.stack(bl), np.stack(bv))
    return (arm_loc, arm_conf, odm_loc, odm_conf, priors), targets, batch


def test_arm_loss_matches_oracle(rng):
    preds, targets, (bt, bl, bv) = _make_inputs(rng)
    want_l, want_c = np_refinedet_loss(*preds, targets, 2, use_arm=False)
    got = refinedet_multibox_loss(
        tuple(jnp.asarray(x) for x in preds),
        jnp.asarray(bt), jnp.asarray(bl), jnp.asarray(bv),
        num_classes=2, use_arm=False)
    np.testing.assert_allclose(float(got.loss_l), want_l, rtol=2e-3)
    np.testing.assert_allclose(float(got.loss_c), want_c, rtol=2e-3)


def test_odm_loss_matches_oracle(rng):
    preds, targets, (bt, bl, bv) = _make_inputs(rng)
    want_l, want_c = np_refinedet_loss(*preds, targets, C, use_arm=True)
    got = refinedet_multibox_loss(
        tuple(jnp.asarray(x) for x in preds),
        jnp.asarray(bt), jnp.asarray(bl), jnp.asarray(bv),
        num_classes=C, use_arm=True)
    np.testing.assert_allclose(float(got.loss_l), want_l, rtol=2e-3)
    np.testing.assert_allclose(float(got.loss_c), want_c, rtol=2e-3)


def test_odm_theta_filter_drops_positives(rng):
    preds, targets, (bt, bl, bv) = _make_inputs(rng, b=1)
    arm_loc, arm_conf, odm_loc, odm_conf, priors = preds
    # Force ARM objectness ~0 everywhere: all ODM positives dropped -> N=0.
    arm_conf = np.zeros_like(arm_conf)
    arm_conf[:, :, 0] = 50.0
    got = refinedet_multibox_loss(
        (jnp.asarray(arm_loc), jnp.asarray(arm_conf),
         jnp.asarray(odm_loc), jnp.asarray(odm_conf), jnp.asarray(priors)),
        jnp.asarray(bt), jnp.asarray(bl), jnp.asarray(bv),
        num_classes=C, use_arm=True)
    assert float(got.num_pos) == 0
    assert float(got.loss_l) == 0.0 and float(got.loss_c) == 0.0


def test_no_gt_returns_zero_losses(rng):
    preds, _, (bt, bl, bv) = _make_inputs(rng, b=2)
    bv = np.zeros_like(bv)
    got = refinedet_multibox_loss(
        tuple(jnp.asarray(x) for x in preds),
        jnp.asarray(bt), jnp.asarray(bl), jnp.asarray(bv),
        num_classes=2, use_arm=False)
    assert float(got.loss_l) == 0.0 and float(got.loss_c) == 0.0


def test_ssd_multibox_loss_runs(rng):
    preds, targets, (bt, bl, bv) = _make_inputs(rng, b=2)
    _, _, odm_loc, odm_conf, priors = preds
    got = multibox_loss(
        (jnp.asarray(odm_loc), jnp.asarray(odm_conf), jnp.asarray(priors)),
        jnp.asarray(bt), jnp.asarray(bl) - 1, jnp.asarray(bv),
        num_classes=C)
    assert np.isfinite(float(got.loss_l)) and np.isfinite(float(got.loss_c))
    assert float(got.loss_l) > 0


def test_loss_is_differentiable(rng):
    import jax
    preds, targets, (bt, bl, bv) = _make_inputs(rng, b=2)

    def f(arm_loc, arm_conf, odm_loc, odm_conf):
        out = refinedet_multibox_loss(
            (arm_loc, arm_conf, odm_loc, odm_conf, jnp.asarray(preds[4])),
            jnp.asarray(bt), jnp.asarray(bl), jnp.asarray(bv),
            num_classes=C, use_arm=True)
        return out.loss_l + out.loss_c

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(
        *(jnp.asarray(x) for x in preds[:4]))
    for g in grads[2:]:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
