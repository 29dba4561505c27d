"""RefineDet / SSD multibox losses as pure, jit-able functions.

TPU-native counterpart of the reference's loss modules
(``/root/reference/layers/modules/refinedet_multibox_loss.py:10-139`` and
``multibox_loss.py:10-127``). The reference does per-image Python matching
loops on host tensors and boolean-mask gathers (dynamic shapes); here
everything is static-shape: matching is vmapped (see boxes/matcher.py) and
hard-negative mining computes the reference's double-argsort ranks
(refinedet_multibox_loss.py:116-123) as one on-device sort plus an
inverse-permutation scatter.

Semantics preserved:
  * smooth-L1 (beta=1) localization loss summed over positives;
  * mining score = logsumexp(logits) - logit[target], positives zeroed;
  * num_neg = clamp(negpos_ratio * num_pos, max = num_priors - 1) per image;
  * confidence loss = cross-entropy summed over (pos | mined neg);
  * ODM mode: positives with ARM objectness P(obj) <= theta are dropped
    (refinedet_multibox_loss.py:96-101);
  * both losses divided by total positive count N across the batch;
    N < 1 => (0, 0) (refinedet_multibox_loss.py:134-136).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from refinedet_tpu.boxes.matcher import match_batch, refine_match_batch


class LossOutput(NamedTuple):
    loss_l: jnp.ndarray  # scalar localization loss
    loss_c: jnp.ndarray  # scalar confidence loss
    num_pos: jnp.ndarray  # scalar total positives (diagnostic)


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise smooth-L1 (huber beta=1), matching F.smooth_l1_loss."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5)


def _cross_entropy_rows(logits: jnp.ndarray, targets: jnp.ndarray):
    """Per-row CE: logsumexp(logits) - logits[target]. [..., C] x [...] -> [...].

    The target logit is picked with a one-hot contraction rather than
    ``take_along_axis``: a dynamic-index gather over the minor axis lowers
    to a serialized kCustom fusion on TPU (~5 ms per call at B=64,
    P=6375 — measured 10 ms/step across the two heads), while the one-hot
    multiply-reduce is a trivially vectorized elementwise op. Exact: the
    mask selects a single element.
    """
    lse = jax.nn.logsumexp(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=logits.dtype)
    picked = jnp.sum(logits * onehot, axis=-1)
    return lse - picked


def _mined_confidence_loss(conf_data, conf_t, pos, negpos_ratio):
    """Hard-negative mining + summed CE over (pos | neg).

    Args:
      conf_data: [B, P, C] raw logits.
      conf_t: [B, P] int32 targets.
      pos: [B, P] bool positive mask.
    Returns: scalar CE sum, [B] num_pos.
    """
    b, p, _ = conf_data.shape
    ce = _cross_entropy_rows(conf_data, conf_t)      # [B, P]
    mining = jnp.where(pos, 0.0, ce)                 # positives filtered out

    # Rank each prior by descending mining loss. The reference computes
    # rank with a second sort (sort/sort idx_rank trick); since argsort of
    # a permutation is its inverse, we invert `order` with a scatter
    # instead — O(P) rather than a second O(P log^2 P) on-device bitonic
    # sort, bitwise-identical result (argsort is stable).
    order = jnp.argsort(-mining, axis=1)
    iota = jnp.broadcast_to(jnp.arange(p, dtype=order.dtype), order.shape)
    rank = jnp.zeros_like(order).at[
        jnp.arange(b)[:, None], order].set(iota, mode="promise_in_bounds",
                                           unique_indices=True)
    num_pos = jnp.sum(pos, axis=1)                               # [B]
    num_neg = jnp.clip(negpos_ratio * num_pos, max=p - 1)        # [B]
    neg = rank < num_neg[:, None]

    sel = jnp.logical_or(pos, neg)
    loss_c = jnp.sum(jnp.where(sel, ce, 0.0))
    return loss_c, num_pos


def _masked_smooth_l1_sum(loc_data, loc_t, pos):
    """sum over positives of smooth_l1(loc_data - loc_t).

    The residual is zeroed *before* the nonlinearity (double-where): masked
    loc_t entries can be non-finite (e.g. encode against degenerate
    ARM-decoded anchors) and a NaN inside smooth_l1's VJP would poison the
    gradient even though the forward value is masked out.
    """
    diff = jnp.where(pos[..., None], loc_data - loc_t, 0.0)
    return jnp.sum(jnp.where(pos[..., None], smooth_l1(diff), 0.0))


def _finalize(loss_l, loss_c, num_pos):
    n = jnp.sum(num_pos).astype(jnp.float32)
    safe_n = jnp.maximum(n, 1.0)
    valid = n >= 1.0
    return LossOutput(
        jnp.where(valid, loss_l / safe_n, 0.0),
        jnp.where(valid, loss_c / safe_n, 0.0),
        n,
    )


def refinedet_multibox_loss(
    predictions,
    gt_boxes: jnp.ndarray,    # [B, M, 4] point-form, normalized
    gt_labels: jnp.ndarray,   # [B, M] int32 (1-based foreground ids)
    gt_valid: jnp.ndarray,    # [B, M] bool
    *,
    num_classes: int,
    use_arm: bool,
    variances: Sequence[float] = (0.1, 0.2),
    overlap_thresh: float = 0.5,
    negpos_ratio: int = 3,
    theta: float = 0.01,
) -> LossOutput:
    """RefineDet loss for one head (ARM when use_arm=False, else ODM).

    ``predictions`` is the train-phase model output tuple
    (arm_loc [B,P,4], arm_conf [B,P,2], odm_loc [B,P,4],
    odm_conf [B,P,C], priors [P,4]).
    """
    arm_loc, arm_conf, odm_loc, odm_conf, priors = predictions
    if use_arm:
        loc_data, conf_data = odm_loc, odm_conf
    else:
        loc_data, conf_data = arm_loc, arm_conf
    if conf_data.shape[-1] != num_classes:
        raise ValueError(
            f"num_classes={num_classes} does not match the "
            f"{'ODM' if use_arm else 'ARM'} logits' class dim "
            f"{conf_data.shape[-1]}")

    if use_arm:
        loc_t, conf_t = refine_match_batch(
            gt_boxes, gt_labels, gt_valid, priors, variances,
            overlap_thresh, arm_loc=jax.lax.stop_gradient(arm_loc))
    else:
        # ARM is class-agnostic: any valid GT is objectness 1
        # (mirrors refinedet_multibox_loss.py:78-79).
        bin_labels = jnp.ones_like(gt_labels)
        loc_t, conf_t = refine_match_batch(
            gt_boxes, bin_labels, gt_valid, priors, variances,
            overlap_thresh)
    loc_t = jax.lax.stop_gradient(loc_t)
    conf_t = jax.lax.stop_gradient(conf_t)

    pos = conf_t > 0
    if use_arm:
        arm_obj = jax.nn.softmax(jax.lax.stop_gradient(arm_conf),
                                 axis=2)[:, :, 1]
        pos = jnp.logical_and(pos, arm_obj > theta)

    loss_l = _masked_smooth_l1_sum(loc_data, loc_t, pos)
    loss_c, num_pos = _mined_confidence_loss(conf_data, conf_t, pos,
                                             negpos_ratio)
    return _finalize(loss_l, loss_c, num_pos)


def multibox_loss(
    predictions,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,   # [B, M] int32 0-based class ids
    gt_valid: jnp.ndarray,
    *,
    num_classes: int,
    variances: Sequence[float] = (0.1, 0.2),
    overlap_thresh: float = 0.5,
    negpos_ratio: int = 3,
) -> LossOutput:
    """Plain SSD multibox loss (legacy path, multibox_loss.py:10-127).

    ``predictions`` = (loc [B,P,4], conf [B,P,C], priors [P,4]); labels are
    0-based and shifted +1 inside matching (box_utils.py:107).
    """
    loc_data, conf_data, priors = predictions
    loc_t, conf_t = match_batch(gt_boxes, gt_labels, gt_valid, priors,
                                variances, overlap_thresh)
    loc_t = jax.lax.stop_gradient(loc_t)
    conf_t = jax.lax.stop_gradient(conf_t)

    pos = conf_t > 0
    loss_l = _masked_smooth_l1_sum(loc_data, loc_t, pos)
    loss_c, num_pos = _mined_confidence_loss(conf_data, conf_t, pos,
                                             negpos_ratio)
    return _finalize(loss_l, loss_c, num_pos)


class RefineDetMultiBoxLoss:
    """API-parity shim mirroring the reference class constructor signature
    (refinedet_multibox_loss.py:33-48). Callable on (predictions, targets)."""

    def __init__(self, num_classes, overlap_thresh, prior_for_matching=True,
                 bkg_label=0, neg_mining=True, neg_pos=3, neg_overlap=0.5,
                 encode_target=False, use_gpu=True, theta=0.01,
                 use_ARM=False, variances=(0.1, 0.2)):
        del prior_for_matching, bkg_label, neg_mining, neg_overlap
        del encode_target, use_gpu
        self.num_classes = num_classes
        self.overlap_thresh = overlap_thresh
        self.negpos_ratio = neg_pos
        self.theta = theta
        self.use_arm = use_ARM
        self.variances = variances

    def __call__(self, predictions, gt_boxes, gt_labels, gt_valid):
        out = refinedet_multibox_loss(
            predictions, gt_boxes, gt_labels, gt_valid,
            num_classes=self.num_classes, use_arm=self.use_arm,
            variances=self.variances, overlap_thresh=self.overlap_thresh,
            negpos_ratio=self.negpos_ratio, theta=self.theta)
        return out.loss_l, out.loss_c
