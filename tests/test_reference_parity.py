"""Golden parity tests against the ACTUAL reference code.

Imports /root/reference (via tests/reference_modules.py stubs) and pins this
framework's outputs against the reference implementation directly:

  (a) match / refine_match vs layers/box_utils.py:70-160 on random
      padded/unpadded GT sets;
  (b) RefineDetMultiBoxLoss values (ARM + ODM modes) vs
      layers/modules/refinedet_multibox_loss.py:10-139;
  (c) Detect_RefineDet.forward boxes/scores vs
      layers/functions/detection_refinedet.py:27-65 (and the legacy
      forward_python_nms [B,C,topk,5] mode);
  (d) full-model forward parity: one state_dict loaded into BOTH
      /root/reference/models/refinedet.py and the Flax model, plus PriorBox
      output equality (layers/functions/prior_box.py:7-56).

These retire the builder-authored mirrors (tools/torch_refinedet.py,
tests/oracles.py) as the only oracles.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_modules import load_reference, reference_available  # noqa: E402

if not reference_available():
    pytest.skip("/root/reference not mounted", allow_module_level=True)

REF = load_reference()

from refinedet_tpu.boxes.matcher import match, refine_match  # noqa: E402
from refinedet_tpu.boxes.priors import generate_priors  # noqa: E402
from refinedet_tpu.config import DetectConfig, voc_refinedet  # noqa: E402
from refinedet_tpu.detect.detection import (  # noqa: E402
    detect_refinedet, detect_refinedet_nms)
from refinedet_tpu.losses.multibox import refinedet_multibox_loss  # noqa: E402
from refinedet_tpu.models import build_refinedet  # noqa: E402
from refinedet_tpu.models.torch_import import (  # noqa: E402
    torch_state_dict_to_flax)

VARIANCES = (0.1, 0.2)
MAX_BOXES = 10


def _rand_gt(rng, n):
    """n random valid point-form boxes in [0,1] + 0-based labels."""
    cxcy = rng.uniform(0.15, 0.85, (n, 2))
    wh = rng.uniform(0.05, 0.4, (n, 2))
    boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], 1)
    boxes = np.clip(boxes, 0.0, 1.0).astype(np.float32)
    labels = rng.randint(0, 3, n).astype(np.float32)
    return boxes, labels


def _pad(arr, rows, fill=0.0):
    out = np.full((rows,) + arr.shape[1:], fill, arr.dtype)
    out[: len(arr)] = arr
    return out


@pytest.fixture(scope="module")
def priors():
    """Reference PriorBox output for RefineDet320/VOC — also asserts this
    framework's generator matches the real reference, not just the mirror."""
    ref_p = REF.PriorBox(REF.voc_refinedet["320"]).forward().numpy()
    mine = np.asarray(generate_priors(voc_refinedet["320"]))
    assert ref_p.shape == mine.shape == (6375, 4)
    np.testing.assert_allclose(mine, ref_p, atol=1e-6)
    return ref_p


def _ref_match(kind, truths, labels, priors_np, arm_loc=None, thresh=0.5):
    """Run the reference match/refine_match into fresh target tensors."""
    p = len(priors_np)
    loc_t = torch.zeros(1, p, 4)
    conf_t = torch.zeros(1, p, dtype=torch.long)
    t = torch.from_numpy(truths)
    l = torch.from_numpy(labels)
    pr = torch.from_numpy(priors_np)
    if kind == "match":
        REF.box_utils.match(thresh, t, pr, list(VARIANCES), l,
                            loc_t, conf_t, 0)
    else:
        arm = None if arm_loc is None else torch.from_numpy(arm_loc)
        REF.box_utils.refine_match(thresh, t, pr, list(VARIANCES), l,
                                   loc_t, conf_t, 0, arm)
    return loc_t[0].numpy(), conf_t[0].numpy()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("kind", ["match", "refine_arm", "refine_odm"])
def test_matching_parity(priors, kind, seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(1, MAX_BOXES + 1)
    truths, labels = _rand_gt(rng, n)
    arm_loc = (rng.randn(len(priors), 4) * 0.3).astype(np.float32) \
        if kind == "refine_odm" else None
    if kind != "match":
        labels = labels + 1  # refine_match: foreground ids from 1, no shift

    ref_loc, ref_conf = _ref_match(
        "match" if kind == "match" else "refine",
        truths, labels, priors, arm_loc)

    valid = np.arange(MAX_BOXES) < n
    t_pad = jnp.asarray(_pad(truths, MAX_BOXES))
    l_pad = jnp.asarray(_pad(labels.astype(np.int32), MAX_BOXES))
    v = jnp.asarray(valid)
    pr = jnp.asarray(priors)
    if kind == "match":
        got = match(t_pad, l_pad, v, pr, VARIANCES, 0.5)
    elif kind == "refine_arm":
        got = refine_match(t_pad, l_pad, v, pr, VARIANCES, 0.5)
    else:
        got = refine_match(t_pad, l_pad, v, pr, VARIANCES, 0.5,
                           jnp.asarray(arm_loc))

    np.testing.assert_array_equal(np.asarray(got.conf_t), ref_conf)
    pos = ref_conf > 0  # loc targets only consumed where positive
    np.testing.assert_allclose(np.asarray(got.loc_t)[pos], ref_loc[pos],
                               atol=2e-5, rtol=2e-5)


def _rand_predictions(rng, b, p, num_classes):
    arm_loc = (rng.randn(b, p, 4) * 0.3).astype(np.float32)
    arm_conf = (rng.randn(b, p, 2) * 2).astype(np.float32)
    odm_loc = (rng.randn(b, p, 4) * 0.3).astype(np.float32)
    odm_conf = (rng.randn(b, p, num_classes) * 2).astype(np.float32)
    return arm_loc, arm_conf, odm_loc, odm_conf


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("use_arm", [False, True])
def test_loss_parity(priors, use_arm, seed):
    """RefineDetMultiBoxLoss vs the reference, ARM and ODM modes."""
    num_classes, b, p = 4, 3, len(priors)
    rng = np.random.RandomState(100 + seed)
    preds = _rand_predictions(rng, b, p, num_classes if use_arm else 2)
    arm_loc, arm_conf, odm_loc, odm_conf = preds
    if not use_arm:
        # ARM criterion consumes the (arm_loc, arm_conf) slots
        odm_loc_full = (rng.randn(b, p, 4) * 0.3).astype(np.float32)
        odm_conf_full = (rng.randn(b, p, num_classes) * 2).astype(np.float32)
        preds_t = (arm_loc, arm_conf, odm_loc_full, odm_conf_full)
    else:
        arm2 = (rng.randn(b, p, 2) * 2).astype(np.float32)
        loc2 = (rng.randn(b, p, 4) * 0.3).astype(np.float32)
        preds_t = (loc2, arm2, odm_loc, odm_conf)

    gts = [_rand_gt(rng, rng.randint(1, MAX_BOXES + 1)) for _ in range(b)]
    targets = [torch.from_numpy(np.concatenate(
        [bx, (lb + 1)[:, None]], 1)) for bx, lb in gts]

    crit = REF.RefineDetMultiBoxLoss(
        2 if not use_arm else num_classes, 0.5, True, 0, True, 3, 0.5,
        False, use_gpu=False, theta=0.01, use_ARM=use_arm)
    t_preds = tuple(torch.from_numpy(a) for a in preds_t) + (
        torch.from_numpy(np.asarray(priors)),)
    with torch.no_grad():
        ref_l, ref_c = crit(t_preds, targets)

    gt_boxes = jnp.asarray(np.stack([_pad(bx, MAX_BOXES) for bx, _ in gts]))
    gt_labels = jnp.asarray(np.stack(
        [_pad((lb + 1).astype(np.int32), MAX_BOXES) for _, lb in gts]))
    gt_valid = jnp.asarray(np.stack(
        [np.arange(MAX_BOXES) < len(bx) for bx, _ in gts]))
    out = refinedet_multibox_loss(
        tuple(jnp.asarray(a) for a in preds_t) + (jnp.asarray(priors),),
        gt_boxes, gt_labels, gt_valid,
        num_classes=2 if not use_arm else num_classes, use_arm=use_arm)

    np.testing.assert_allclose(float(out.loss_l), float(ref_l),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.loss_c), float(ref_c),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_detect_forward_parity(priors, seed):
    """Live-path Detect_RefineDet.forward (raw boxes/scores)."""
    num_classes, b, p = 5, 2, len(priors)
    rng = np.random.RandomState(200 + seed)
    arm_loc, arm_conf, odm_loc, odm_conf = _rand_predictions(
        rng, b, p, num_classes)
    arm_probs = jax.nn.softmax(jnp.asarray(arm_conf), -1)
    odm_probs = jax.nn.softmax(jnp.asarray(odm_conf), -1)

    det = REF.Detect_RefineDet(num_classes, "320", 0, 1000, 0.01, 0.45,
                               0.01, 500)
    # the reference mutates odm conf in place -> hand it a copy
    with torch.no_grad():
        ref_boxes, ref_scores = det.forward(
            torch.from_numpy(arm_loc),
            torch.from_numpy(np.asarray(arm_probs)).clone(),
            torch.from_numpy(odm_loc),
            torch.from_numpy(np.asarray(odm_probs)).clone(),
            torch.from_numpy(np.asarray(priors)))

    boxes, scores = detect_refinedet(
        jnp.asarray(arm_loc), arm_probs, jnp.asarray(odm_loc), odm_probs,
        jnp.asarray(priors), variances=VARIANCES, objectness_thresh=0.01)

    np.testing.assert_allclose(np.asarray(boxes), ref_boxes.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), ref_scores.numpy(),
                               atol=1e-5)


def test_detect_nms_mode_parity(priors):
    """Legacy internal-NMS mode: same surviving (score, box) rows per class.

    Uses a reduced prior set (NMS is O(P^2) pairwise on the reference's
    per-class candidate list) and no keep_top_k cap (inert in the
    reference — detection_refinedet.py:109-112 operates on a copy)."""
    num_classes, p = 4, 600
    rng = np.random.RandomState(7)
    sub = np.asarray(priors)[rng.choice(len(priors), p, replace=False)]
    arm_loc, arm_conf, odm_loc, odm_conf = _rand_predictions(
        rng, 1, p, num_classes)
    arm_probs = jax.nn.softmax(jnp.asarray(arm_conf), -1)
    odm_probs = jax.nn.softmax(jnp.asarray(odm_conf), -1)

    top_k = 50
    det = REF.Detect_RefineDet(num_classes, "320", 0, top_k, 0.01, 0.45,
                               0.01, 500)
    with torch.no_grad():
        ref_out = det.forward_python_nms(
            torch.from_numpy(arm_loc),
            torch.from_numpy(np.asarray(arm_probs)).clone(),
            torch.from_numpy(odm_loc),
            torch.from_numpy(np.asarray(odm_probs)).clone(),
            torch.from_numpy(sub)).numpy()

    cfg = DetectConfig(num_classes=num_classes, top_k=top_k, keep_top_k=500,
                       conf_thresh=0.01, nms_thresh=0.45,
                       objectness_thresh=0.01)
    got = np.asarray(detect_refinedet_nms(
        jnp.asarray(arm_loc), arm_probs, jnp.asarray(odm_loc), odm_probs,
        jnp.asarray(sub), cfg))

    assert got.shape == ref_out.shape
    for cl in range(1, num_classes):
        ref_rows = ref_out[0, cl][ref_out[0, cl, :, 0] > 0]
        got_rows = got[0, cl][got[0, cl, :, 0] > 0]
        assert len(ref_rows) == len(got_rows), f"class {cl} survivor count"
        # order can differ on score ties; sort by score desc then x1
        key = lambda r: (-r[:, 0], r[:, 1])
        ref_rows = ref_rows[np.lexsort(key(ref_rows)[::-1])]
        got_rows = got_rows[np.lexsort(key(got_rows)[::-1])]
        np.testing.assert_allclose(got_rows, ref_rows, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("train_mode", [False, True])
def test_bn_variant_forward_parity(train_mode):
    """BN-variant forward parity vs models/refinedet_bn.py (built with
    backbone_dict=dict(bn=True)): one state_dict (convs + BN scale/bias +
    running stats) into both nets. eval mode exercises running-average
    normalization; train mode exercises batch-statistics normalization.
    (flax updates the running var with the biased batch variance vs
    torch's unbiased — at N=2*40*40+ per channel the relative gap is
    <1e-4 and normalization itself is biased in both, so outputs agree.)

    Size 512: the reference's BN builder only works at 512/896 — its
    ``arm`` channel table (refinedet_bn.py:370-373) has no '320' entry,
    so build_refinedet('train', 320, ..., bn=True) raises KeyError in
    the reference itself. Our use_bn=True 320 variant is beyond-reference
    and covered by tests/test_model.py.
    """
    from refinedet_tpu.models.torch_import import torch_state_dict_to_flax_bn

    torch.manual_seed(3)
    num_classes = 4
    ref_net = REF.refinedet_bn.build_refinedet(
        "train", 512, num_classes, backbone_dict=dict(bn=True))
    # perturb BN params/stats away from their (1, 0) / (0, 1) defaults so
    # the comparison actually exercises the affine + running-stat paths
    with torch.no_grad():
        for m in ref_net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.3, 0.3)
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    ref_net.train(train_mode)
    variables = torch_state_dict_to_flax_bn(ref_net.state_dict())

    jmodel = build_refinedet("train", 512, num_classes, use_bn=True)
    rng = np.random.RandomState(4)
    x = (rng.randn(2, 512, 512, 3) * 20).astype(np.float32)
    with torch.no_grad():
        t_out = ref_net(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    if train_mode:
        j_out, _ = jmodel.raw_forward(variables, jnp.asarray(x),
                                      train=True, mutable=["batch_stats"])
    else:
        j_out = jmodel.raw_forward(variables, jnp.asarray(x))

    for name, t, j in zip(("arm_loc", "arm_conf", "odm_loc", "odm_conf"),
                          t_out, j_out):
        t, j = t.numpy(), np.asarray(j)
        assert t.shape == j.shape, name
        err = np.abs(t - j).max() / (np.abs(t).max() + 1e-6)
        assert err < 5e-4, (name, err)


@pytest.mark.slow
def test_896_five_source_forward_parity(monkeypatch):
    """896 five-source wiring vs the reference's sketched code path.

    The reference 896 variant is DEAD CODE as shipped: refinedet_bn.py
    carries full 896 builder tables (:347-375) but data/config.py has no
    '896' anchor entry, so RefineDet.__init__ raises KeyError. Injecting
    this framework's 896 anchor config (the natural extension of the
    320/512 rule) into the reference module lets its sketched path run —
    and pins our five-source implementation (conv3_3 L2Norm tap, 5-level
    TCB chain with step=4, extended anchor grid) to it numerically,
    priors included."""
    from refinedet_tpu.config import coco_refinedet
    from refinedet_tpu.models.torch_import import torch_state_dict_to_flax_bn

    cfg = coco_refinedet["896"]
    ref_cfg_dict = dict(REF.coco_refinedet["512"])
    ref_cfg_dict.update({
        "num_classes": cfg.num_classes,
        "feature_maps": list(cfg.feature_maps),
        "min_dim": cfg.min_dim,
        "steps": list(cfg.steps),
        "min_sizes": list(cfg.min_sizes),
        "max_sizes": list(cfg.max_sizes),
        "aspect_ratios": [list(a) for a in cfg.aspect_ratios],
        "name": "RefineDet_COCO_896",
    })
    monkeypatch.setitem(REF.refinedet_bn.coco_refinedet, "896",
                        ref_cfg_dict)

    torch.manual_seed(6)
    num_classes = 2
    ref_net = REF.refinedet_bn.build_refinedet(
        "train", 896, num_classes, backbone_dict=dict(bn=True))
    ref_net.eval()
    variables = torch_state_dict_to_flax_bn(ref_net.state_dict(),
                                            num_sources=5)

    jmodel = build_refinedet("train", 896, num_classes, use_bn=True)
    rng = np.random.RandomState(8)
    x = (rng.randn(1, 896, 896, 3) * 20).astype(np.float32)
    with torch.no_grad():
        t_out = ref_net(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    j_out = jmodel.raw_forward(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(jmodel.priors),
                               t_out[4].numpy(), atol=1e-6)
    for name, t, j in zip(("arm_loc", "arm_conf", "odm_loc", "odm_conf"),
                          t_out, j_out):
        t, j = t.numpy(), np.asarray(j)
        assert t.shape == j.shape, name
        err = np.abs(t - j).max() / (np.abs(t).max() + 1e-6)
        assert err < 5e-4, (name, err)


@pytest.mark.slow
def test_one_train_step_equivalence():
    """THE composite train-parity claim: identical weights + identical
    batch through BOTH full train steps — reference (torch forward,
    RefineDetMultiBoxLoss ARM+ODM, backward, torch.optim.SGD with
    momentum 0.9 / wd 5e-4, train_refinedet.py:179-258) and ours (one
    jitted step from refinedet_tpu.train) — must produce the same
    parameter UPDATE. Forward, matching, mining, loss, backward and
    optimizer semantics all have to agree for the deltas to line up."""
    import optax  # noqa: F401  (train dep, ensures env parity)
    from refinedet_tpu.config import TrainConfig
    from refinedet_tpu.train import make_optimizer, make_train_step
    from refinedet_tpu.train.train_step import TrainState

    torch.manual_seed(1)
    num_classes, b, max_boxes = 4, 2, 4
    lr, momentum, wd = 0.01, 0.9, 5e-4

    ref_net = REF.refinedet.build_refinedet("train", 320, num_classes)
    ref_net.train()
    # deep-copy: state_dict tensors are views of the live parameters, and
    # opt.step() below mutates them in place — aliased leaves would
    # silently hand OUR step the post-update weights
    params0 = jax.tree.map(np.array,
                           torch_state_dict_to_flax(ref_net.state_dict()))

    rng = np.random.RandomState(5)
    x = (rng.randn(b, 320, 320, 3) * 30).astype(np.float32)
    gts = [_rand_gt(rng, rng.randint(1, max_boxes + 1)) for _ in range(b)]

    # --- reference step ---
    opt = torch.optim.SGD(ref_net.parameters(), lr=lr, momentum=momentum,
                          weight_decay=wd)
    arm_crit = REF.RefineDetMultiBoxLoss(2, 0.5, True, 0, True, 3, 0.5,
                                         False, use_gpu=False)
    odm_crit = REF.RefineDetMultiBoxLoss(num_classes, 0.5, True, 0, True,
                                         3, 0.5, False, use_gpu=False,
                                         use_ARM=True)
    out = ref_net(torch.from_numpy(
        np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    targets = [torch.from_numpy(np.concatenate(
        [bx, (lb + 1)[:, None].astype(np.float32)], 1))
        for bx, lb in gts]
    la, ca = arm_crit(out, targets)
    lo, co = odm_crit(out, targets)
    ref_loss = la + ca + lo + co
    opt.zero_grad()
    ref_loss.backward()
    opt.step()
    ref_after = jax.tree.map(
        np.array, torch_state_dict_to_flax(ref_net.state_dict()))

    # --- our step (float32 for tight comparison) ---
    model = build_refinedet("train", 320, num_classes)
    tx = make_optimizer(lambda s: lr, momentum=momentum, weight_decay=wd)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params0,
                       opt_state=tx.init(params0), batch_stats=None)
    step = make_train_step(model, tx, TrainConfig(batch_size=b,
                                                  max_boxes=max_boxes))
    gt_boxes = jnp.asarray(np.stack([_pad(bx, max_boxes) for bx, _ in gts]))
    gt_labels = jnp.asarray(np.stack(
        [_pad((lb + 1).astype(np.int32), max_boxes) for _, lb in gts]))
    gt_valid = jnp.asarray(np.stack(
        [np.arange(max_boxes) < len(bx) for bx, _ in gts]))
    new_state, metrics = step(state, jnp.asarray(x), gt_boxes, gt_labels,
                              gt_valid)

    np.testing.assert_allclose(float(metrics["loss"]), float(ref_loss),
                               rtol=2e-4, atol=1e-5)

    flat_ref0 = jax.tree_util.tree_leaves_with_path(params0)
    flat_ref1 = dict(jax.tree_util.tree_leaves_with_path(ref_after))
    flat_new = dict(jax.tree_util.tree_leaves_with_path(new_state.params))
    checked = 0
    for path, w0 in flat_ref0:
        d_ref = np.asarray(flat_ref1[path]) - np.asarray(w0)
        d_our = np.asarray(flat_new[path]) - np.asarray(w0)
        denom = np.linalg.norm(d_ref) + 1e-12
        rel = np.linalg.norm(d_our - d_ref) / denom
        name = jax.tree_util.keystr(path)
        assert rel < 2e-2, (name, rel, float(denom))
        checked += 1
    assert checked > 50  # every conv kernel/bias + L2Norm scales


def test_priorbox_512_parity():
    """PriorBox equality at 512 (16,320 priors, data/config.py:83) vs the
    real reference — closes the plain-512 hole in the size/variant parity
    matrix (the configuration behind the reference's 80.50 mAP headline)."""
    ref_p = REF.PriorBox(REF.voc_refinedet["512"]).forward().numpy()
    mine = np.asarray(generate_priors(voc_refinedet["512"]))
    assert ref_p.shape == mine.shape == (16320, 4)
    np.testing.assert_allclose(mine, ref_p, atol=1e-6)


@pytest.mark.slow
def test_full_model_forward_parity_512():
    """Plain (non-BN) RefineDet512 forward parity: one random state_dict
    into BOTH the reference net (models/refinedet.py:278-291, size=512)
    and the Flax model; raw train-phase heads and the 16,320 priors must
    agree. Completes the {320, 512, 896} x {plain, BN-where-defined}
    reference-direct matrix (round-2 verdict item #4)."""
    torch.manual_seed(2)
    ref_net = REF.refinedet.build_refinedet("train", 512, 21).eval()
    jmodel = build_refinedet("train", 512, 21)
    variables = {"params": torch_state_dict_to_flax(ref_net.state_dict())}

    rng = np.random.RandomState(2)
    x = (rng.randn(1, 512, 512, 3) * 30).astype(np.float32)
    with torch.no_grad():
        t_out = ref_net(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    j_out = jmodel.raw_forward(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(jmodel.priors),
                               t_out[4].numpy(), atol=1e-6)
    for name, t, j in zip(("arm_loc", "arm_conf", "odm_loc", "odm_conf"),
                          t_out, j_out):
        t, j = t.numpy(), np.asarray(j)
        assert t.shape == j.shape, name
        err = np.abs(t - j).max() / (np.abs(t).max() + 1e-6)
        assert err < 2e-4, (name, err)


@pytest.mark.slow
def test_nstep_train_equivalence():
    """Multi-step training equivalence vs the actual reference (round-2
    verdict item #3): 9 consecutive steps on shared fresh batches through
    BOTH train loops, with the REAL per-iteration LR schedule — the
    5-epoch linear warmup ramp AND both gamma-decay boundaries
    (train_refinedet.py:280-292 ``adjust_learning_rate`` + the stepvalues
    logic at :197,233-235; epoch_size=1, max_epoch=9 puts warmup at steps
    0-4 and the 2/3- and 8/9-boundaries at steps 6 and 8). Pins what
    single-step parity cannot: momentum accumulation across steps and the
    schedule application order."""
    from refinedet_tpu.config import TrainConfig
    from refinedet_tpu.train import (make_lr_schedule, make_optimizer,
                                     make_train_step)
    from refinedet_tpu.train.train_step import TrainState

    torch.manual_seed(11)
    num_classes, b, max_boxes = 4, 2, 4
    initial_lr, momentum, wd, gamma = 0.005, 0.9, 5e-4, 0.1
    n_steps, epoch_size, max_epoch, warmup_epoch = 9, 1, 9, 5

    ref_net = REF.refinedet.build_refinedet("train", 320, num_classes)
    ref_net.train()
    params0 = jax.tree.map(np.array,
                           torch_state_dict_to_flax(ref_net.state_dict()))

    rng = np.random.RandomState(17)
    batches = []
    for _ in range(n_steps):
        x = (rng.randn(b, 320, 320, 3) * 30).astype(np.float32)
        gts = [_rand_gt(rng, rng.randint(1, max_boxes + 1))
               for _ in range(b)]
        batches.append((x, gts))

    # --- reference loop (exact driver logic, constants from the test) ---
    opt = torch.optim.SGD(ref_net.parameters(), lr=initial_lr,
                          momentum=momentum, weight_decay=wd)
    arm_crit = REF.RefineDetMultiBoxLoss(2, 0.5, True, 0, True, 3, 0.5,
                                         False, use_gpu=False)
    odm_crit = REF.RefineDetMultiBoxLoss(num_classes, 0.5, True, 0, True,
                                         3, 0.5, False, use_gpu=False,
                                         use_ARM=True)
    stepvalues = (max_epoch * 2 // 3 * epoch_size,
                  max_epoch * 8 // 9 * epoch_size,
                  max_epoch * epoch_size)
    step_index, epoch = 0, 0
    ref_losses, ref_lrs = [], []
    for iteration in range(n_steps):
        if iteration % epoch_size == 0:
            epoch += 1
        if iteration in stepvalues:
            step_index += 1
        if epoch <= warmup_epoch:
            lr = 1e-6 + (initial_lr - 1e-6) * iteration / (
                epoch_size * warmup_epoch)
        else:
            lr = initial_lr * (gamma ** step_index)
        for group in opt.param_groups:
            group["lr"] = lr
        ref_lrs.append(lr)
        x, gts = batches[iteration]
        targets = [torch.from_numpy(np.concatenate(
            [bx, (lb + 1)[:, None].astype(np.float32)], 1))
            for bx, lb in gts]
        out = ref_net(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        la, ca = arm_crit(out, targets)
        lo, co = odm_crit(out, targets)
        loss = la + ca + lo + co
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))
    ref_after = jax.tree.map(
        np.array, torch_state_dict_to_flax(ref_net.state_dict()))

    # --- our loop: same schedule as a pure function of the step ---
    sched = make_lr_schedule(initial_lr, gamma, epoch_size, max_epoch,
                             warmup_epochs=warmup_epoch)
    for i, ref_lr in enumerate(ref_lrs):  # schedule itself must agree
        np.testing.assert_allclose(float(sched(i)), ref_lr, rtol=1e-6)
    model = build_refinedet("train", 320, num_classes)
    tx = make_optimizer(sched, momentum=momentum, weight_decay=wd)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params0,
                       opt_state=tx.init(params0), batch_stats=None)
    step = make_train_step(model, tx, TrainConfig(batch_size=b,
                                                  max_boxes=max_boxes))
    our_losses = []
    for x, gts in batches:
        gt_boxes = jnp.asarray(np.stack(
            [_pad(bx, max_boxes) for bx, _ in gts]))
        gt_labels = jnp.asarray(np.stack(
            [_pad((lb + 1).astype(np.int32), max_boxes) for _, lb in gts]))
        gt_valid = jnp.asarray(np.stack(
            [np.arange(max_boxes) < len(bx) for bx, _ in gts]))
        state, metrics = step(state, jnp.asarray(x), gt_boxes, gt_labels,
                              gt_valid)
        our_losses.append(float(metrics["loss"]))

    # per-step losses track the reference's trajectory
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3,
                               atol=1e-4)
    # final params match within an accumulation-scaled tolerance
    flat_ref0 = jax.tree_util.tree_leaves_with_path(params0)
    flat_ref1 = dict(jax.tree_util.tree_leaves_with_path(ref_after))
    flat_new = dict(jax.tree_util.tree_leaves_with_path(state.params))
    checked = 0
    for path, w0 in flat_ref0:
        d_ref = np.asarray(flat_ref1[path]) - np.asarray(w0)
        d_our = np.asarray(flat_new[path]) - np.asarray(w0)
        denom = np.linalg.norm(d_ref) + 1e-12
        rel = np.linalg.norm(d_our - d_ref) / denom
        name = jax.tree_util.keystr(path)
        assert rel < 5e-2, (name, rel, float(denom))
        checked += 1
    assert checked > 50


@pytest.mark.slow
def test_bn_nstep_batch_stats_drift():
    """BN-variant multi-step pinning: 3 train steps through the reference
    BN-512 net and our use_bn train step on shared weights/batches; the
    running statistics (torch running_mean/running_var vs flax
    batch_stats) must drift identically. Catches momentum-convention and
    update-order bugs that forward parity at fixed stats cannot. (torch
    folds the UNBIASED batch variance into running_var vs flax's biased —
    at N=4096+ elements per channel the relative gap is <3e-4/step.)"""
    from refinedet_tpu.config import TrainConfig
    from refinedet_tpu.models.torch_import import torch_state_dict_to_flax_bn
    from refinedet_tpu.train import make_optimizer, make_train_step
    from refinedet_tpu.train.train_step import TrainState

    torch.manual_seed(13)
    num_classes, b, max_boxes, n_steps = 2, 1, 3, 3
    lr, momentum, wd = 1e-3, 0.9, 5e-4

    ref_net = REF.refinedet_bn.build_refinedet(
        "train", 512, num_classes, backbone_dict=dict(bn=True))
    with torch.no_grad():  # move stats off the (0,1) fixed point
        for m in ref_net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    ref_net.train()
    vars0 = jax.tree.map(np.array,
                         torch_state_dict_to_flax_bn(ref_net.state_dict()))

    rng = np.random.RandomState(19)
    batches = []
    for _ in range(n_steps):
        x = (rng.randn(b, 512, 512, 3) * 20).astype(np.float32)
        # num_classes=2 -> the only foreground id is 1 (0-based label 0)
        gts = [(bx, np.zeros_like(lb)) for bx, lb in
               (_rand_gt(rng, rng.randint(1, max_boxes + 1))
                for _ in range(b))]
        batches.append((x, gts))

    opt = torch.optim.SGD(ref_net.parameters(), lr=lr, momentum=momentum,
                          weight_decay=wd)
    arm_crit = REF.RefineDetMultiBoxLoss(2, 0.5, True, 0, True, 3, 0.5,
                                         False, use_gpu=False)
    odm_crit = REF.RefineDetMultiBoxLoss(num_classes, 0.5, True, 0, True,
                                         3, 0.5, False, use_gpu=False,
                                         use_ARM=True)
    ref_losses, ref_stats_per_step = [], []
    for x, gts in batches:
        targets = [torch.from_numpy(np.concatenate(
            [bx, (lb + 1)[:, None].astype(np.float32)], 1))
            for bx, lb in gts]
        out = ref_net(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
        la, ca = arm_crit(out, targets)
        lo, co = odm_crit(out, targets)
        loss = la + ca + lo + co
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))
        ref_stats_per_step.append(jax.tree.map(
            np.array,
            torch_state_dict_to_flax_bn(ref_net.state_dict()))
            ["batch_stats"])

    model = build_refinedet("train", 512, num_classes, use_bn=True)
    tx = make_optimizer(lambda s: lr, momentum=momentum, weight_decay=wd)
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=vars0["params"],
                       opt_state=tx.init(vars0["params"]),
                       batch_stats=vars0["batch_stats"])
    step = make_train_step(model, tx, TrainConfig(batch_size=b,
                                                  max_boxes=max_boxes))
    our_losses, our_stats_per_step = [], []
    for x, gts in batches:
        gt_boxes = jnp.asarray(np.stack(
            [_pad(bx, max_boxes) for bx, _ in gts]))
        gt_labels = jnp.asarray(np.stack(
            [_pad((lb + 1).astype(np.int32), max_boxes) for _, lb in gts]))
        gt_valid = jnp.asarray(np.stack(
            [np.arange(max_boxes) < len(bx) for bx, _ in gts]))
        state, metrics = step(state, jnp.asarray(x), gt_boxes, gt_labels,
                              gt_valid)
        our_losses.append(float(metrics["loss"]))
        our_stats_per_step.append(jax.tree.map(np.asarray,
                                               state.batch_stats))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-2,
                               atol=1e-3)

    def stats_err(step_idx):
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(
            ref_stats_per_step[step_idx]))
        flat_our = jax.tree_util.tree_leaves_with_path(
            our_stats_per_step[step_idx])
        assert len(flat_our) > 20
        return [(jax.tree_util.keystr(p),
                 np.abs(np.asarray(o) - flat_ref[p]).max()
                 / (np.abs(flat_ref[p]).max() + 1e-6))
                for p, o in flat_our]

    # After step 1 both sides folded batch statistics of IDENTICAL inputs
    # through identical initial weights — any momentum-convention or
    # update-order bug shows up here at full size (torch's unbiased-var
    # fold contributes <2e-3 at the smallest N=64-per-channel extras map).
    for name, err in stats_err(0):
        assert err < 5e-3, ("step1", name, err)
    # After 3 steps the inputs to each BN have themselves diverged by the
    # accumulated (tolerance-bounded) parameter deltas, so only gross
    # divergence is a bug; a momentum mixup (0.9 vs 0.1) would show ~9x.
    for name, err in stats_err(n_steps - 1):
        assert err < 5e-2, ("step3", name, err)


@pytest.mark.slow
def test_full_model_forward_parity():
    """One random state_dict into BOTH the reference RefineDet and the Flax
    model; raw train-phase heads and priors must agree."""
    torch.manual_seed(0)
    ref_net = REF.refinedet.build_refinedet("train", 320, 21).eval()
    jmodel = build_refinedet("train", 320, 21)
    variables = {"params": torch_state_dict_to_flax(ref_net.state_dict())}

    rng = np.random.RandomState(0)
    x = (rng.randn(1, 320, 320, 3) * 30).astype(np.float32)
    with torch.no_grad():
        t_out = ref_net(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))))
    j_out = jmodel.raw_forward(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(jmodel.priors),
                               t_out[4].numpy(), atol=1e-6)
    for name, t, j in zip(("arm_loc", "arm_conf", "odm_loc", "odm_conf"),
                          t_out, j_out):
        t, j = t.numpy(), np.asarray(j)
        assert t.shape == j.shape, name
        err = np.abs(t - j).max() / (np.abs(t).max() + 1e-6)
        assert err < 2e-4, (name, err)


def test_nstep_train_equivalence_with_real_augmentation(monkeypatch):
    """The FULL composed training loop vs the reference (round-3 verdict
    item #6): reference ``SSDAugmentation -> detection_collate -> net ->
    losses -> SGD`` against our ``SSDAugmentation -> detection_collate
    (padded) -> jitted train step``, 5 steps, BOTH pipelines consuming
    identically-seeded random streams. The augmentation parity suite pins
    the transforms sample-by-sample; this pins that the composition —
    collation, target conventions, matching, loss, optimizer — reproduces
    the reference's training dynamics end to end (the closest this
    environment gets to the 79.8-mAP north star without VOC data)."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841 - both pipelines need it
    import data as ref_data  # the reference package (sys.path has /root/reference)
    from test_augment_reference_parity import (_ReplayNumpyRandom,
                                               _ReplayPyRandom, _rand_sample,
                                               MEAN)
    from refinedet_tpu.config import TrainConfig
    from refinedet_tpu.data.augmentations import SSDAugmentation as OurAug
    from refinedet_tpu.data.collate import detection_collate as our_collate
    from refinedet_tpu.train import make_optimizer, make_train_step
    from refinedet_tpu.train.train_step import TrainState

    torch.manual_seed(23)
    num_classes, b, max_boxes, n_steps = 4, 2, 8, 5
    lr, momentum, wd = 1e-4, 0.9, 5e-4  # constant LR: the schedule itself
    # is pinned by test_nstep_train_equivalence; this test isolates the
    # data-path composition.

    ref_net = REF.refinedet.build_refinedet("train", 320, num_classes)
    ref_net.train()
    params0 = jax.tree.map(np.array,
                           torch_state_dict_to_flax(ref_net.state_dict()))

    # --- shared augmented batches, each pipeline drawing from its own
    # copy of the identical random stream ---
    ref_batches, our_batches = [], []
    ours_aug = OurAug(320, MEAN, boxes_normalized=False, to_rgb=False)
    for step_i in range(n_steps):
        ref_samples, our_samples = [], []
        for k in range(b):
            seed = 37 + step_i * b + k
            img, boxes, labels = _rand_sample(seed)
            gen = np.random.default_rng(seed)
            monkeypatch.setattr(REF.augmentations, "random",
                                _ReplayNumpyRandom(gen))
            monkeypatch.setattr(REF.augmentations, "rdm",
                                _ReplayPyRandom(gen))
            r_img, r_boxes, r_labels = REF.augmentations.SSDAugmentation(
                size=320, mean=MEAN)(img.copy(), boxes.copy(), labels.copy())
            ref_samples.append((
                torch.from_numpy(
                    np.ascontiguousarray(r_img.transpose(2, 0, 1))),
                np.hstack([r_boxes,
                           r_labels[:, None].astype(np.float32)])))
            o_img, o_boxes, o_labels = ours_aug(
                img.copy(), boxes.copy(), labels.copy(),
                rng=np.random.default_rng(seed))
            # the two pipelines really did produce the same batch
            np.testing.assert_allclose(o_img, r_img, atol=1e-4)
            np.testing.assert_allclose(o_boxes, r_boxes, atol=1e-6)
            np.testing.assert_array_equal(o_labels, r_labels)
            our_samples.append((o_img, o_boxes, o_labels))
        ref_batches.append(ref_data.detection_collate(ref_samples))
        our_batches.append(our_collate(our_samples, max_boxes))
        assert our_batches[-1].valid.any(), "augmentation dropped all GT"

    # --- reference loop (driver logic, constant LR) ---
    opt = torch.optim.SGD(ref_net.parameters(), lr=lr, momentum=momentum,
                          weight_decay=wd)
    arm_crit = REF.RefineDetMultiBoxLoss(2, 0.5, True, 0, True, 3, 0.5,
                                         False, use_gpu=False)
    odm_crit = REF.RefineDetMultiBoxLoss(num_classes, 0.5, True, 0, True,
                                         3, 0.5, False, use_gpu=False,
                                         use_ARM=True)
    ref_losses = []
    for imgs, targets in ref_batches:
        out = ref_net(imgs)
        la, ca = arm_crit(out, targets)
        lo, co = odm_crit(out, targets)
        loss = la + ca + lo + co
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))
    ref_after = jax.tree.map(
        np.array, torch_state_dict_to_flax(ref_net.state_dict()))

    # --- our loop through the jitted train step ---
    model = build_refinedet("train", 320, num_classes)
    tx = make_optimizer(lambda step: lr, momentum=momentum, weight_decay=wd)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params0,
                       opt_state=tx.init(params0), batch_stats=None)
    step = make_train_step(model, tx, TrainConfig(batch_size=b,
                                                  max_boxes=max_boxes))
    our_losses = []
    for batch in our_batches:
        state, metrics = step(state, jnp.asarray(batch.images),
                              jnp.asarray(batch.boxes),
                              jnp.asarray(batch.labels),
                              jnp.asarray(batch.valid))
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-3, atol=1e-4)
    flat_ref0 = jax.tree_util.tree_leaves_with_path(params0)
    flat_ref1 = dict(jax.tree_util.tree_leaves_with_path(ref_after))
    flat_new = dict(jax.tree_util.tree_leaves_with_path(state.params))
    checked = 0
    for path, w0 in flat_ref0:
        d_ref = np.asarray(flat_ref1[path]) - np.asarray(w0)
        d_our = np.asarray(flat_new[path]) - np.asarray(w0)
        rel = np.linalg.norm(d_our - d_ref) / (np.linalg.norm(d_ref) + 1e-12)
        assert rel < 5e-2, (jax.tree_util.keystr(path), rel)
        checked += 1
    assert checked > 50
