"""Two-step RefineDet detection post-processing (jit-able, static shapes).

TPU-native counterpart of
``/root/reference/layers/functions/detection_refinedet.py`` (Detect_RefineDet)
and ``detection.py`` (legacy SSD Detect). The reference loops per image /
per class on host; here the cascade decode is one fused batched op and NMS is
the class-parallel static-shape kernel from ops/nms.py.

Both reference output modes are provided:
  * ``detect_refinedet`` — the live path (detection_refinedet.py:27-65):
    ARM-objectness filtering + cascade decode, returning raw
    (boxes [B,P,4], scores [B,P,C]); NMS is deferred to the caller
    (the COCO eval path, eval_refinedet_coco.py:213-232).
  * ``detect_refinedet_nms`` — the legacy/internal-NMS path
    (detection_refinedet.py:67-113, detection.py): per-class NMS inside,
    emitting a fixed [B, C, top_k, 5] (score, x1, y1, x2, y2) tensor.

Note: the reference's keep_top_k global cap at detection_refinedet.py:109-112
operates on a masked *copy* (``flt[mask].fill_(0)`` is a torch no-op), so the
cap never takes effect there; ``apply_keep_top_k=False`` reproduces that
behavior and is the default.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from refinedet_tpu.boxes.codec import decode
from refinedet_tpu.boxes.geometry import center_size
from refinedet_tpu.config import DetectConfig
from refinedet_tpu.ops.dispatch import class_parallel_nms


def cascade_decode(arm_loc: jnp.ndarray, odm_loc: jnp.ndarray,
                   priors: jnp.ndarray,
                   variances: Sequence[float]) -> jnp.ndarray:
    """ARM->ODM two-step decode: odm offsets are relative to ARM-refined
    anchors (detection_refinedet.py:56-59). [..., P, 4] -> [..., P, 4]."""
    refined = center_size(decode(arm_loc, priors, variances))
    return decode(odm_loc, refined, variances)


def filter_objectness(arm_conf: jnp.ndarray, odm_conf: jnp.ndarray,
                      objectness_thresh: float) -> jnp.ndarray:
    """Zero all class scores where ARM P(object) <= thresh
    (detection_refinedet.py:40-42). arm_conf/odm_conf are probabilities."""
    obj = arm_conf[..., 1:2]
    return jnp.where(obj <= objectness_thresh,
                     jnp.zeros_like(odm_conf), odm_conf)


@functools.partial(jax.jit, static_argnames=())
def detect_refinedet(arm_loc, arm_conf, odm_loc, odm_conf, priors,
                     variances=(0.1, 0.2), objectness_thresh=0.01):
    """Live-path detector: returns (boxes [B,P,4], scores [B,P,C]).

    All conf inputs are post-softmax probabilities, mirroring the model's
    test phase (models/refinedet.py:139-149).
    """
    scores = filter_objectness(arm_conf, odm_conf, objectness_thresh)
    boxes = cascade_decode(arm_loc, odm_loc, priors, variances)
    return boxes, scores


def detect_refinedet_nms(arm_loc, arm_conf, odm_loc, odm_conf, priors,
                         cfg: DetectConfig,
                         apply_keep_top_k: bool = False) -> jnp.ndarray:
    """Internal-NMS detector: [B, num_classes, top_k, 5] (score, box).

    Per class c >= 1: scores <= conf_thresh are dropped, per-class greedy
    NMS (torch-NMS semantics: no +1 area) keeps up to top_k; empty slots are
    zero. ``apply_keep_top_k=True`` additionally zeroes detections outside
    the global keep_top_k by score rank (the reference's intended but
    inert cap).
    """
    boxes, scores = detect_refinedet(
        arm_loc, arm_conf, odm_loc, odm_conf, priors,
        variances=cfg.variance, objectness_thresh=cfg.objectness_thresh)

    b, p, c = scores.shape
    k = min(cfg.top_k, p)

    # [B, C-1, P] class scores against shared per-image boxes.
    cls_scores = jnp.moveaxis(scores[..., 1:], -1, 1)
    bx, sc = class_parallel_nms(
        boxes[:, None], cls_scores, cfg.nms_thresh, top_k=k,
        score_thresh=cfg.conf_thresh, plus_one=False)
    cls_out = jnp.concatenate([sc[..., None], bx], axis=-1)  # [B,C-1,K,5]
    background = jnp.zeros((b, 1, k, 5), cls_out.dtype)
    out = jnp.concatenate([background, cls_out], axis=1)  # [B, C, K, 5]

    if apply_keep_top_k and cfg.keep_top_k < c * k:
        flat = out.reshape(b, -1, 5)
        order = jnp.argsort(-flat[..., 0], axis=1)
        rank = jnp.argsort(order, axis=1)
        flat = jnp.where((rank < cfg.keep_top_k)[..., None], flat, 0.0)
        out = flat.reshape(b, c, k, 5)
    return out


def detect_ssd(loc, conf, priors, cfg: DetectConfig) -> jnp.ndarray:
    """Legacy SSD Detect (detection.py:7-64): single-step decode +
    per-class internal NMS -> [B, num_classes, top_k, 5]."""
    b = loc.shape[0]
    boxes = decode(loc, priors, cfg.variance)
    k = min(cfg.top_k, loc.shape[1])

    cls_scores = jnp.moveaxis(conf[..., 1:], -1, 1)  # [B, C-1, P]
    bx, sc = class_parallel_nms(
        boxes[:, None], cls_scores, cfg.nms_thresh, top_k=k,
        score_thresh=cfg.conf_thresh, plus_one=False)
    cls_out = jnp.concatenate([sc[..., None], bx], axis=-1)
    background = jnp.zeros((b, 1, k, 5), cls_out.dtype)
    return jnp.concatenate([background, cls_out], axis=1)


class Detect_RefineDet:
    """API-parity shim mirroring the reference constructor
    (detection_refinedet.py:13-26). ``forward`` returns (boxes, scores);
    ``forward_python_nms`` the [B, C, top_k, 5] tensor."""

    def __init__(self, num_classes, size, bkg_label, top_k, conf_thresh,
                 nms_thresh, objectness_thre, keep_top_k,
                 variance=(0.1, 0.2)):
        del bkg_label, size
        self.cfg = DetectConfig(
            num_classes=num_classes, top_k=top_k, keep_top_k=keep_top_k,
            conf_thresh=conf_thresh, nms_thresh=nms_thresh,
            objectness_thresh=objectness_thre, variance=tuple(variance))

    def forward(self, arm_loc, arm_conf, odm_loc, odm_conf, priors):
        return detect_refinedet(
            arm_loc, arm_conf, odm_loc, odm_conf, priors,
            variances=self.cfg.variance,
            objectness_thresh=self.cfg.objectness_thresh)

    __call__ = forward

    def forward_python_nms(self, arm_loc, arm_conf, odm_loc, odm_conf,
                           priors):
        return detect_refinedet_nms(arm_loc, arm_conf, odm_loc, odm_conf,
                                    priors, self.cfg)
