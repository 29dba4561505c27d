"""Vectorized anchor-GT matching (bipartite + threshold assignment).

TPU-native counterpart of the reference's per-image Python matching loops
(``/root/reference/layers/box_utils.py:70-160``, ``match``/``refine_match``).
The reference mutates output tensors in a Python loop per batch element and
runs an O(num_objects) index-fix loop; here matching is a pure function over
fixed-shape padded GT (``max_boxes`` rows + validity mask) that vmaps over the
batch and compiles to a handful of XLA reductions — no host round-trips.

Semantics preserved exactly:
  * torch ``max`` tie-breaking (first maximal index) == ``jnp.argmax``;
  * the best-prior force step (overlap := 2) applies per *valid* GT, and when
    several GTs share a best prior the **last** GT wins, matching the
    sequential overwrite loop at box_utils.py:104-105 / 149-150;
  * label offset: +1 for the SSD ``match`` path (box_utils.py:107), none for
    ``refine_match`` (box_utils.py:153,156);
  * ODM mode matches against ARM-decoded anchors and encodes relative to
    their center-size form (box_utils.py:132-136,157).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from refinedet_tpu.boxes.codec import decode, encode
from refinedet_tpu.boxes.geometry import center_size, jaccard, point_form


class MatchResult(NamedTuple):
    loc_t: jnp.ndarray   # [P, 4] encoded regression targets
    conf_t: jnp.ndarray  # [P] int32 class targets (0 = background)


def _bipartite_assign(overlaps: jnp.ndarray, valid: jnp.ndarray):
    """Shared assignment core.

    Args:
      overlaps: [M, P] IoU between (padded) GTs and anchors.
      valid: [M] bool — True for real GT rows.
    Returns:
      best_truth_idx [P] int32, best_truth_overlap [P] float.
    """
    m = overlaps.shape[0]
    p = overlaps.shape[1]
    overlaps = jnp.where(valid[:, None], overlaps, -1.0)

    best_prior_idx = jnp.argmax(overlaps, axis=1)        # [M] best anchor per GT
    best_truth_overlap = jnp.max(overlaps, axis=0)       # [P]
    best_truth_idx = jnp.argmax(overlaps, axis=0)        # [P]

    # NOTE for callers: index into the M-row GT tables via
    # ``_take_rows``/one-hot contraction, not ``table[best_truth_idx]`` —
    # a [P]-indexed gather over a minor axis serializes on TPU (measured
    # ~10 ms/step at B=64 across ARM+ODM matching).

    # Force-assign each valid GT to its best anchor; last GT wins on conflict.
    hits = valid[:, None] & (best_prior_idx[:, None] == jnp.arange(p)[None, :])
    forced = jnp.any(hits, axis=0)                       # [P]
    last_j = (m - 1) - jnp.argmax(hits[::-1], axis=0)    # [P]
    best_truth_idx = jnp.where(forced, last_j, best_truth_idx)
    best_truth_overlap = jnp.where(forced, 2.0, best_truth_overlap)
    return best_truth_idx.astype(jnp.int32), best_truth_overlap


def _take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` as a one-hot contraction (exact — one unit per row).

    ``table`` is [M] or [M, K] with small M (max_boxes), ``idx`` is [P]
    int. Lowers to a broadcast-select-reduce / tiny matmul instead of a
    TPU-hostile dynamic gather.
    """
    m = table.shape[0]
    if table.ndim == 2 and jnp.issubdtype(table.dtype, jnp.floating):
        onehot = jax.nn.one_hot(idx, m, dtype=table.dtype)     # [P, M]
        return onehot @ table                                  # [P, K]
    hit = idx[:, None] == jnp.arange(m)[None, :]               # [P, M]
    expand = table[None, :] if table.ndim == 1 else table[None, :, :]
    picked = jnp.where(hit if table.ndim == 1 else hit[..., None],
                       expand, jnp.zeros_like(expand))
    return jnp.sum(picked, axis=1)


def match(truths: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray,
          priors: jnp.ndarray, variances: Sequence[float],
          threshold: float) -> MatchResult:
    """SSD matching (reference ``match``): anchors = raw priors, labels +1.

    Args:
      truths: [M, 4] point-form GT boxes (padded rows arbitrary).
      labels: [M] int32 0-based class ids.
      valid:  [M] bool validity mask.
      priors: [P, 4] center-size anchors.
    """
    overlaps = jaccard(truths, point_form(priors))
    best_truth_idx, best_truth_overlap = _bipartite_assign(overlaps, valid)
    matches = _take_rows(truths, best_truth_idx)
    conf = _take_rows(labels.astype(jnp.int32), best_truth_idx) + 1
    conf = jnp.where(best_truth_overlap < threshold, 0, conf)
    loc = encode(matches, priors, variances)
    return MatchResult(loc, conf)


def refine_match(truths: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray,
                 priors: jnp.ndarray, variances: Sequence[float],
                 threshold: float,
                 arm_loc: jnp.ndarray | None = None) -> MatchResult:
    """Cascaded matching (reference ``refine_match``).

    ARM mode (``arm_loc is None``): anchors = raw priors, labels used as-is
    (callers pass binary objectness labels, mirroring
    refinedet_multibox_loss.py:78-79).
    ODM mode: anchors = ARM-decoded boxes; encode relative to their
    center-size form.
    """
    if arm_loc is None:
        anchors_pf = point_form(priors)
        encode_base = priors
    else:
        anchors_pf = decode(arm_loc, priors, variances)
        encode_base = center_size(anchors_pf)

    overlaps = jaccard(truths, anchors_pf)
    best_truth_idx, best_truth_overlap = _bipartite_assign(overlaps, valid)
    matches = _take_rows(truths, best_truth_idx)
    conf = _take_rows(labels.astype(jnp.int32), best_truth_idx)
    conf = jnp.where(best_truth_overlap < threshold, 0, conf)
    loc = encode(matches, encode_base, variances)
    return MatchResult(loc, conf)


def match_batch(truths, labels, valid, priors, variances, threshold):
    """vmapped SSD matching over the batch dimension."""
    return jax.vmap(
        lambda t, l, v: match(t, l, v, priors, variances, threshold)
    )(truths, labels, valid)


def refine_match_batch(truths, labels, valid, priors, variances, threshold,
                       arm_loc=None):
    """vmapped cascaded matching over the batch dimension."""
    if arm_loc is None:
        fn = lambda t, l, v: refine_match(t, l, v, priors, variances, threshold)
        return jax.vmap(fn)(truths, labels, valid)
    fn = lambda t, l, v, a: refine_match(t, l, v, priors, variances,
                                         threshold, a)
    return jax.vmap(fn)(truths, labels, valid, arm_loc)
