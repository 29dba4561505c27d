"""Backend dispatch for NMS.

On TPU the Pallas sweep kernel (ops/nms_pallas.py) is the only sane choice:
it compiles in ~2s and keeps the whole sweep in VMEM. The XLA fori_loop
formulation (ops/nms.py) is kept as the portable reference path (CPU tests,
oracle comparisons) — its unrolled-loop HLO takes the TPU compiler many
minutes, so it is never selected on TPU.

``class_parallel_nms`` is the shared high-level helper used by the
detection post-processors: batched multi-class NMS returning exactly
``top_k`` compacted (score-descending, zero-padded) rows per group.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from refinedet_tpu.ops.nms import NmsResult, nms
from refinedet_tpu.ops.nms_pallas import nms_pallas


def batched_nms_auto(boxes: jnp.ndarray, scores: jnp.ndarray,
                     iou_thresh: float, top_k: int,
                     score_thresh: float = -jnp.inf,
                     plus_one: bool = False,
                     backend: str | None = None) -> NmsResult:
    """NMS over arbitrary leading dims. boxes [..., N, 4] (broadcast against
    scores' leading dims), scores [..., N]."""
    backend = backend or jax.default_backend()
    lead = scores.shape[:-1]
    n = scores.shape[-1]
    if boxes.ndim == scores.ndim + 1 and boxes.shape[:-2] != lead:
        boxes = jnp.broadcast_to(boxes, lead + (n, 4))
    elif boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[None], lead + (n, 4))

    if backend == "tpu":
        return nms_pallas(boxes, scores, iou_thresh, top_k=top_k,
                          score_thresh=score_thresh, plus_one=plus_one)

    flat_b = boxes.reshape((-1, n, 4))
    flat_s = scores.reshape((-1, n))
    res = jax.vmap(
        lambda b, s: nms(b, s, iou_thresh, top_k=top_k,
                         score_thresh=score_thresh, plus_one=plus_one)
    )(flat_b, flat_s)
    k = res.indices.shape[-1]
    return NmsResult(res.indices.reshape(lead + (k,)),
                     res.keep.reshape(lead + (k,)),
                     res.scores.reshape(lead + (k,)))


def class_parallel_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                       iou_thresh: float, top_k: int,
                       score_thresh: float = -jnp.inf,
                       plus_one: bool = False,
                       backend: str | None = None):
    """Batched NMS + compaction.

    Args:
      boxes: [..., N, 4] (or broadcastable); scores [..., N].
    Returns (boxes_out [..., top_k, 4], scores_out [..., top_k]) with
    survivors first in descending score, zeros after.
    """
    res = batched_nms_auto(boxes, scores, iou_thresh, top_k,
                           score_thresh, plus_one, backend)
    lead = scores.shape[:-1]
    n = scores.shape[-1]
    if boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[None], lead + (n, 4))
    else:
        boxes = jnp.broadcast_to(boxes, lead + (n, 4))

    order = jnp.argsort(~res.keep, axis=-1, stable=True)
    keep_sorted = jnp.take_along_axis(res.keep, order, axis=-1)
    sc = jnp.take_along_axis(
        jnp.where(res.keep, res.scores, 0.0), order, axis=-1)
    idx_sorted = jnp.take_along_axis(res.indices, order, axis=-1)
    bx = jnp.take_along_axis(boxes, idx_sorted[..., None], axis=-2)
    bx = jnp.where(keep_sorted[..., None], bx, 0.0)

    k = sc.shape[-1]
    if k >= top_k:
        return bx[..., :top_k, :], sc[..., :top_k]
    pad = top_k - k
    sc = jnp.pad(sc, [(0, 0)] * (sc.ndim - 1) + [(0, pad)])
    bx = jnp.pad(bx, [(0, 0)] * (bx.ndim - 2) + [(0, pad), (0, 0)])
    return bx, sc
