"""Pallas TPU kernel for batched greedy NMS.

TPU-native replacement for the reference's CUDA bitmask NMS
(``/root/reference/utils/nms/nms_kernel.cu:34-144``): the same O(K^2)
dependency structure — dense IoU comparisons plus a sequential greedy
suppression sweep — reorganized for the TPU:

  * the XLA reference path (ops/nms.py) materializes a [G, K, K] IoU
    matrix in HBM (G = batch*classes); this kernel never does — each
    group's candidate coordinates live as four [1, K] lane vectors in
    VMEM and the sweep folds one IoU row at a time into a [1, K]
    suppression vector, so HBM traffic is just boxes in / keep mask out;
  * Mosaic has no dynamic value indexing, so the current row's scalar
    coordinates are extracted with masked lane reductions
    (``sum(where(col == g, v, 0))``) — an idiom that keeps the entire
    sweep in VPU vector ops;
  * one grid step per (batch x class) group; TPU grid steps execute
    sequentially but groups are independent, letting Mosaic pipeline
    the VMEM loads of group i+1 under the sweep of group i.

Contract matches ops/nms.nms on score-sorted input: candidates sorted
descending by score, ``valid`` marks real entries; returns the keep mask.
Both +1 and no-+1 area conventions supported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from refinedet_tpu.ops.nms import NmsResult

LANE = 128  # candidate count must be a multiple of the lane width


def _nms_sweep_kernel(count_ref, boxes_ref, valid_ref, keep_ref, *,
                      iou_thresh: float, plus_one: float, k: int):
    """Grid = (G,). count [G] (whole array in SMEM, indexed by program_id),
    boxes [K, 4], valid [1, K] -> keep [1, K]."""
    ax1 = boxes_ref[:, 0:1].reshape(1, k)
    ay1 = boxes_ref[:, 1:2].reshape(1, k)
    ax2 = boxes_ref[:, 2:3].reshape(1, k)
    ay2 = boxes_ref[:, 3:4].reshape(1, k)
    area = (ax2 - ax1 + plus_one) * (ay2 - ay1 + plus_one)  # [1, K]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    valid = valid_ref[:]  # [1, K] float32 (0/1)

    def pick(vec, mask):
        return jnp.sum(jnp.where(mask, vec, 0.0))

    # The sweep visits only SURVIVING rows: after each kept box g it jumps
    # straight to the next valid, unsuppressed candidate (suppressed rows
    # cannot suppress others in greedy NMS, so skipping them is exact).
    # Iterations = #kept boxes, not #candidates; with the per-group bound
    # from count_ref (last valid index + 1, computed by the caller) the
    # whole sweep is O(#kept) rows of [1, K] vector work instead of the
    # reference CUDA kernel's dense O(K^2/64) bitmask.
    n_rows = count_ref[pl.program_id(0)]

    def next_active(g_prev, sup):
        open_ = jnp.logical_and(sup == 0.0, valid != 0.0)
        open_ = jnp.logical_and(open_, col > g_prev)
        return jnp.min(jnp.where(open_, col, k)).astype(jnp.int32)

    def cond(carry):
        g, _ = carry
        return g < n_rows

    def body(carry):
        g, sup = carry
        m = col == g
        x1g = pick(ax1, m)
        y1g = pick(ay1, m)
        x2g = pick(ax2, m)
        y2g = pick(ay2, m)
        area_g = (x2g - x1g + plus_one) * (y2g - y1g + plus_one)
        iw = jnp.maximum(jnp.minimum(x2g, ax2) - jnp.maximum(x1g, ax1)
                         + plus_one, 0.0)
        ih = jnp.maximum(jnp.minimum(y2g, ay2) - jnp.maximum(y1g, ay1)
                         + plus_one, 0.0)
        inter = iw * ih
        iou = inter / (area_g + area - inter)
        hits = jnp.logical_and(iou > iou_thresh, col > g)
        sup = jnp.where(hits, 1.0, sup)
        return next_active(g, sup), sup

    sup0 = jnp.zeros((1, k), jnp.float32)
    g0 = next_active(jnp.int32(-1), sup0)
    _, sup = jax.lax.while_loop(cond, body, (g0, sup0))
    keep_ref[:] = jnp.where(
        jnp.logical_and(sup == 0.0, valid != 0.0), 1.0, 0.0)


def nms_sweep_pallas(boxes: jnp.ndarray, valid: jnp.ndarray,
                     iou_thresh: float, plus_one: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched suppression sweep.

    Args:
      boxes: [G, K, 4] score-descending candidates (K a multiple of 128).
      valid: [G, K] bool.
    Returns keep [G, K] bool.
    """
    g, k, _ = boxes.shape
    assert k % LANE == 0, f"K must be a multiple of {LANE}, got {k}"
    # Per-group sweep bound = last valid index + 1 (robust to arbitrary,
    # non-prefix valid masks).
    rev_any = jnp.argmax(valid[:, ::-1].astype(jnp.int32), axis=1)
    counts = jnp.where(jnp.any(valid, axis=1), k - rev_any,
                       0).astype(jnp.int32)
    kernel = functools.partial(
        _nms_sweep_kernel, iou_thresh=float(iou_thresh),
        plus_one=1.0 if plus_one else 0.0, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts, whole [G]
            pl.BlockSpec((None, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, k), jnp.float32),
        interpret=interpret,
    )(counts, boxes, valid[:, None, :].astype(jnp.float32))
    return out[:, 0, :] != 0.0


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
               top_k: int = 256, score_thresh: float = -jnp.inf,
               plus_one: bool = False,
               interpret: bool = False) -> NmsResult:
    """Drop-in alternative to ops.nms.nms backed by the Pallas sweep.

    boxes [..., N, 4], scores [..., N]; leading dims are flattened into the
    kernel grid. top_k is rounded up to a 128 multiple internally.
    """
    lead = scores.shape[:-1]
    n = scores.shape[-1]
    k = min(_round_up(top_k, LANE), _round_up(n, LANE))
    flat_scores = scores.reshape(-1, n)
    flat_boxes = boxes.reshape(-1, n, 4) if boxes.ndim == scores.ndim + 1 \
        else jnp.broadcast_to(boxes[None], (flat_scores.shape[0], n, 4))

    top_scores, top_idx = jax.lax.top_k(flat_scores, min(k, n))
    if k > n:  # pad to the 128-multiple kernel width
        pad = k - n
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)),
                             constant_values=-jnp.inf)
        top_idx = jnp.pad(top_idx, ((0, 0), (0, pad)))
    cand = jnp.take_along_axis(flat_boxes, top_idx[..., None], axis=1)
    # Ranks >= top_k exist only to pad the kernel width to a lane
    # multiple — mark them invalid so they can neither suppress nor be
    # kept, keeping the candidate set identical to the XLA/CPU backend's
    # exact top_k (backend-divergent detections otherwise).
    valid = jnp.logical_and(top_scores > score_thresh,
                            jnp.arange(k) < top_k)
    keep = nms_sweep_pallas(cand, valid, iou_thresh, plus_one=plus_one,
                            interpret=interpret)
    return NmsResult(top_idx.reshape(*lead, k), keep.reshape(*lead, k),
                     top_scores.reshape(*lead, k))
