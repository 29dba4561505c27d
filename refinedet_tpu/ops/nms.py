"""Static-shape greedy NMS for TPU (pure XLA formulation).

TPU-native replacement for the reference's native NMS stack
(``/root/reference/utils/nms/cpu_nms.pyx``, ``nms_kernel.cu``,
``gpu_nms.pyx``, dispatched by ``utils/nms_wrapper.py:23-31``): greedy hard
NMS reformulated for static shapes:

  1. top-k candidate selection (``lax.top_k``, score-descending);
  2. one dense IoU matrix over the K candidates (a single fused
     batched-matmul-shaped op the TPU handles well);
  3. a sequential suppression sweep over the K rows
     (``lax.fori_loop`` — the same dependency structure as the CUDA
     kernel's 64-bit mask reduction, nms_kernel.cu:124-140).

Both area conventions are supported: ``plus_one=True`` mirrors the
C/CUDA/numpy family (cpu_nms.pyx:24); ``plus_one=False`` the torch NMS
(box_utils.py:241). Everything vmaps over classes and batch.

A Pallas bitmask kernel (ops/nms_pallas.py) implements the same contract for
large K; this module is the portable reference path and the test oracle
anchor. Soft-NMS (cpu_nms.pyx:70-163) is provided as ``soft_nms``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from refinedet_tpu.boxes.geometry import iou_pairwise


class NmsResult(NamedTuple):
    indices: jnp.ndarray  # [K] indices into the input, score-descending
    keep: jnp.ndarray     # [K] bool — True for surviving boxes
    scores: jnp.ndarray   # [K] scores of the candidates


def _suppression_sweep(iou: jnp.ndarray, valid: jnp.ndarray,
                       iou_thresh: float) -> jnp.ndarray:
    """Sequential greedy suppression over score-sorted candidates.

    iou: [K, K] candidate IoU matrix (sorted by descending score).
    valid: [K] candidates that passed the confidence threshold.
    Returns keep mask [K].
    """
    k = iou.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (k,), 0)

    def body(i, suppressed):
        active = jnp.logical_and(~suppressed[i], valid[i])
        hits = jnp.logical_and(iou[i] > iou_thresh, col > i)
        return jnp.where(jnp.logical_and(active, hits), True, suppressed)

    suppressed = jax.lax.fori_loop(
        0, k, body, jnp.zeros((k,), dtype=bool))
    return jnp.logical_and(~suppressed, valid)


@functools.partial(jax.jit, static_argnames=("top_k", "plus_one"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
        top_k: int = 200, score_thresh: float = -jnp.inf,
        plus_one: bool = False) -> NmsResult:
    """Greedy hard NMS over one set of boxes.

    Args:
      boxes: [N, 4] point-form boxes.
      scores: [N] confidence scores.
      iou_thresh: suppression threshold (IoU > thresh suppresses).
      top_k: static number of candidates to consider (score-descending).
      score_thresh: candidates at or below are marked invalid.
      plus_one: +1 pixel-area convention (C/CUDA parity).
    """
    n = scores.shape[0]
    k = min(top_k, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    cand = boxes[top_idx]
    valid = top_scores > score_thresh
    iou = iou_pairwise(cand, cand, plus_one=plus_one)
    keep = _suppression_sweep(iou, valid, iou_thresh)
    return NmsResult(top_idx, keep, top_scores)


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
                top_k: int = 200, score_thresh: float = -jnp.inf,
                plus_one: bool = False) -> NmsResult:
    """Class-parallel NMS: boxes [C, N, 4] (or shared [N, 4]), scores [C, N].

    Each class runs independently via vmap — on TPU the C classes' IoU
    matrices and sweeps batch into one compiled program.
    """
    if boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[None], (scores.shape[0],) + boxes.shape)
    fn = lambda b, s: nms(b, s, iou_thresh, top_k=top_k,
                          score_thresh=score_thresh, plus_one=plus_one)
    return jax.vmap(fn)(boxes, scores)


@functools.partial(jax.jit, static_argnames=("method", "top_k"))
def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float = 0.3,
             sigma: float = 0.5, score_thresh: float = 0.001,
             method: str = "linear", top_k: int = 200) -> NmsResult:
    """Soft-NMS (linear / gaussian / hard), semantics of cpu_nms.pyx:70-163.

    Score decay instead of hard suppression; +1 area convention (as the
    Cython original). Returns rescored candidates; ``keep`` marks scores
    above ``score_thresh``.
    """
    n = scores.shape[0]
    k = min(top_k, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    cand = boxes[top_idx]
    iou = iou_pairwise(cand, cand, plus_one=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (k,), 0)

    def body(_, state):
        # Exact Cython semantics: each round selects the CURRENT max among
        # the remaining pool (not original-score order — decay reorders),
        # decays the rest of the pool against it, and permanently discards
        # pool boxes whose decayed score drops below score_thresh.
        live_scores, processed, dead = state
        in_pool = jnp.logical_not(jnp.logical_or(processed, dead))
        pool_scores = jnp.where(in_pool, live_scores, -jnp.inf)
        cur = jnp.argmax(pool_scores)
        # Only boxes above score_thresh get a turn (the Cython loop breaks
        # once the remaining max drops to <= score_thresh).
        has = pool_scores[cur] > score_thresh
        row = iou[cur]
        if method == "linear":
            decay = jnp.where(row > iou_thresh, 1.0 - row, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(row * row) / sigma)
        else:  # hard
            decay = jnp.where(row > iou_thresh, 0.0, 1.0)
        others = jnp.logical_and(in_pool, col != cur)
        do = jnp.logical_and(others, has)
        new_scores = jnp.where(do, live_scores * decay, live_scores)
        newly_dead = jnp.logical_and(do, new_scores < score_thresh)
        processed = jnp.logical_or(processed,
                                   jnp.logical_and(has, col == cur))
        dead = jnp.logical_or(dead, newly_dead)
        return new_scores, processed, dead

    zeros = jnp.zeros((k,), bool)
    final, processed, _ = jax.lax.fori_loop(
        0, k, body, (top_scores, zeros, zeros))
    return NmsResult(top_idx, processed, final)
