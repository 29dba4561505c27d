"""Box geometry primitives (pure jnp, shape-polymorphic, vmap-friendly).

TPU-native counterpart of the reference's torch box math
(``/root/reference/layers/box_utils.py:5-68``). All functions are pure and
broadcast over leading batch dimensions where noted; everything is static-shape
so it fuses under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def point_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (xmin, ymin, xmax, ymax). [..., 4]."""
    cxcy, wh = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=-1)


def center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """(xmin, ymin, xmax, ymax) -> (cx, cy, w, h). [..., 4]."""
    mins, maxs = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([(maxs + mins) / 2, maxs - mins], axis=-1)


def intersect(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area. box_a [A,4], box_b [B,4] -> [A,B]."""
    max_xy = jnp.minimum(box_a[:, None, 2:], box_b[None, :, 2:])
    min_xy = jnp.maximum(box_a[:, None, :2], box_b[None, :, :2])
    inter = jnp.clip(max_xy - min_xy, 0.0)
    return inter[..., 0] * inter[..., 1]


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Point-form box area (no +1 convention). [..., 4] -> [...]."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def jaccard(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of point-form boxes. [A,4] x [B,4] -> [A,B].

    Semantics match reference box_utils.py:50-68 (no +1 area convention).
    """
    inter = intersect(box_a, box_b)
    union = area(box_a)[:, None] + area(box_b)[None, :] - inter
    return inter / union


def log_sum_exp(x: jnp.ndarray) -> jnp.ndarray:
    """Max-stabilized log-sum-exp over the last axis, keepdims.

    API parity with box_utils.py:208-216 (used there for hard-negative
    mining); the reference stabilizes with the global max, which is
    mathematically identical.
    """
    x_max = jnp.max(x)
    return jnp.log(jnp.sum(jnp.exp(x - x_max), axis=-1,
                           keepdims=True)) + x_max


def iou_pairwise(box_a: jnp.ndarray, box_b: jnp.ndarray,
                 plus_one: bool = False) -> jnp.ndarray:
    """Pairwise IoU with optional +1 pixel-area convention.

    The reference's C/CUDA/numpy NMS paths (cpu_nms.pyx:24, nms_kernel.cu,
    py_cpu_nms.py) use ``(x2-x1+1)*(y2-y1+1)`` areas while the torch NMS
    (box_utils.py:241) does not; both conventions are supported for parity.
    """
    off = 1.0 if plus_one else 0.0
    max_xy = jnp.minimum(box_a[:, None, 2:], box_b[None, :, 2:])
    min_xy = jnp.maximum(box_a[:, None, :2], box_b[None, :, :2])
    inter_wh = jnp.clip(max_xy - min_xy + off, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]

    def _area(b):
        return (b[..., 2] - b[..., 0] + off) * (b[..., 3] - b[..., 1] + off)

    union = _area(box_a)[:, None] + _area(box_b)[None, :] - inter
    return inter / union
