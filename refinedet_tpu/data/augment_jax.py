"""On-device SSD augmentation (pure JAX, fused into the train step).

TPU-native re-design of the host cv2 pipeline
(``/root/reference/utils/augmentations.py:401-418`` /
refinedet_tpu/data/augmentations.py): the BASELINE.json north star asks for
the SSDAugmentation chain as an on-device JAX preprocessing pipeline. The
host only decodes + squash-resizes each image to a fixed staging canvas;
everything random runs on device, vmapped over the batch, from explicit
PRNG keys:

  * photometric distortion — brightness +/-32, contrast 0.5-1.5 (random
    order), saturation/hue in HSV (jnp HSV conversion below), random
    channel permutation; elementwise VPU work, fused by XLA;
  * the geometric chain expand -> IoU-constrained crop -> resize collapses
    into ONE affine resample (``jax.image.scale_and_translate``): the
    sampled expand canvas and crop rect define a single source rectangle,
    and because the image is mean-subtracted first, out-of-canvas samples
    (zeros) are exactly the reference's mean fill;
  * the 50-trial constrained crop search is vectorized: all trials'
    rects, IoU constraints and center-keep masks are evaluated at once and
    the first valid trial is selected (no data-dependent loops);
  * horizontal mirror is a lane flip + box reflection.

Distribution differences vs the reference (documented, by design):
  * crop geometry is sampled in squash-staged coordinates (the reference
    samples in raw coordinates and squashes later — both end as affine
    maps of the raw image; only the crop aspect prior differs slightly);
  * when no crop trial satisfies the constraints the image passes through
    uncropped (the reference re-rolls the mode forever);
  * bilinear resampling is one-step (cv2 does up to two resizes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

_PERMS = jnp.array([[0, 1, 2], [0, 2, 1], [1, 0, 2],
                    [1, 2, 0], [2, 0, 1], [2, 1, 0]])

# (min_iou, max_iou, unconstrained?) rows for the 6 reference crop modes;
# mode 0 = no crop.
_MODE_MIN = jnp.array([0.0, 0.1, 0.3, 0.7, 0.9, -jnp.inf])
_MODE_MAX = jnp.array([0.0, jnp.inf, jnp.inf, jnp.inf, jnp.inf, jnp.inf])


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] RGB (any positive scale) -> HSV with H in [0, 360)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    c = maxc - minc
    s = jnp.where(maxc > 0, c / jnp.maximum(maxc, 1e-12), 0.0)
    safe_c = jnp.maximum(c, 1e-12)
    hr = ((g - b) / safe_c) % 6.0
    hg = (b - r) / safe_c + 2.0
    hb = (r - g) / safe_c + 4.0
    h = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb))
    h = jnp.where(c > 0, h * 60.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = (h % 360.0) / 60.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def photometric_distort(img: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Reference PhotometricDistort semantics on [H, W, 3] RGB float32."""
    ks = jax.random.split(key, 11)

    img = jnp.where(jax.random.bernoulli(ks[0]),
                    img + jax.random.uniform(ks[1], (), minval=-32.0,
                                             maxval=32.0), img)

    def contrast(x, kflag, kval):
        alpha = jax.random.uniform(kval, (), minval=0.5, maxval=1.5)
        return jnp.where(jax.random.bernoulli(kflag), x * alpha, x)

    first = jax.random.bernoulli(ks[2])
    img = jnp.where(first, contrast(img, ks[3], ks[4]), img)
    hsv = rgb_to_hsv(jnp.clip(img, 0.0, None))
    sat = jax.random.uniform(ks[5], (), minval=0.5, maxval=1.5)
    hsv = hsv.at[..., 1].multiply(
        jnp.where(jax.random.bernoulli(ks[6]), sat, 1.0))
    hue = jax.random.uniform(ks[7], (), minval=-18.0, maxval=18.0)
    hsv = hsv.at[..., 0].add(jnp.where(jax.random.bernoulli(ks[8]), hue,
                                       0.0))
    img = hsv_to_rgb(hsv)
    img = jnp.where(~first, contrast(img, ks[3], ks[4]), img)
    # Independent draws for WHICH permutation and WHETHER to apply it
    # (sharing one key would couple the 1/2 coin with the choice-of-6).
    perm = _PERMS[jax.random.randint(ks[9], (), 0, 6)]
    img = jnp.where(jax.random.bernoulli(ks[10]), img[..., perm], img)
    return img


class CropSample(NamedTuple):
    rect: jnp.ndarray   # [4] x1, y1, x2, y2 in canvas coordinates
    offset: jnp.ndarray  # [2] expand left, top (image origin in canvas)


def _sample_geometry(key: jax.Array, boxes: jnp.ndarray,
                     valid: jnp.ndarray, w: float, h: float,
                     num_trials: int = 50) -> CropSample:
    """Sample expand + constrained crop. boxes are absolute [M, 4] in
    image coordinates."""
    k_exp, k_ratio, k_off, k_mode, k_trial = jax.random.split(key, 5)

    # Expand (p=1/2): canvas r*W x r*H with the image at (left, top).
    do_expand = jax.random.bernoulli(k_exp)
    ratio = jnp.where(do_expand,
                      jax.random.uniform(k_ratio, (), minval=1.0,
                                         maxval=4.0), 1.0)
    off = jax.random.uniform(k_off, (2,)) * jnp.array([w, h]) * (ratio - 1)
    off = jnp.floor(off)
    cw_full, ch_full = w * ratio, h * ratio
    cboxes = boxes + jnp.concatenate([off, off])  # canvas coords

    # Crop mode; mode 0 = keep full canvas.
    mode = jax.random.randint(k_mode, (), 0, 6)
    min_iou = _MODE_MIN[mode]
    max_iou = _MODE_MAX[mode]

    kt = jax.random.split(k_trial, 4)
    tw = jax.random.uniform(kt[0], (num_trials,), minval=0.3 * cw_full,
                            maxval=cw_full)
    th = jax.random.uniform(kt[1], (num_trials,), minval=0.3 * ch_full,
                            maxval=ch_full)
    tx = jax.random.uniform(kt[2], (num_trials,)) * (cw_full - tw)
    ty = jax.random.uniform(kt[3], (num_trials,)) * (ch_full - th)
    rects = jnp.stack([jnp.floor(tx), jnp.floor(ty),
                       jnp.floor(tx) + jnp.floor(tw),
                       jnp.floor(ty) + jnp.floor(th)], axis=1)  # [T, 4]

    aspect_ok = jnp.logical_and(th / tw >= 0.5, th / tw <= 2.0)

    # IoU of every valid box against every trial rect: [T, M]
    lt = jnp.maximum(cboxes[None, :, :2], rects[:, None, :2])
    rb = jnp.minimum(cboxes[None, :, 2:], rects[:, None, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_b = ((cboxes[:, 2] - cboxes[:, 0]) *
              (cboxes[:, 3] - cboxes[:, 1]))[None, :]
    area_r = ((rects[:, 2] - rects[:, 0]) *
              (rects[:, 3] - rects[:, 1]))[:, None]
    iou = inter / jnp.maximum(area_b + area_r - inter, 1e-12)
    iou = jnp.where(valid[None, :], iou, jnp.nan)
    iou_min = jnp.nanmin(iou, axis=1)
    iou_max = jnp.nanmax(iou, axis=1)
    # Reference retry condition: overlap.min() < min_iou AND
    # max_iou < overlap.max() (augmentations.py:270-272).
    iou_ok = ~jnp.logical_and(iou_min < min_iou, max_iou < iou_max)

    centers = (cboxes[:, :2] + cboxes[:, 2:]) / 2.0
    inside = jnp.logical_and(
        jnp.logical_and(rects[:, None, 0] < centers[None, :, 0],
                        rects[:, None, 1] < centers[None, :, 1]),
        jnp.logical_and(rects[:, None, 2] > centers[None, :, 0],
                        rects[:, None, 3] > centers[None, :, 1]))
    inside = jnp.logical_and(inside, valid[None, :])
    center_ok = jnp.any(inside, axis=1)

    trial_ok = aspect_ok & iou_ok & center_ok
    any_ok = jnp.any(trial_ok)
    first_ok = jnp.argmax(trial_ok)

    full = jnp.array([0.0, 0.0, 1.0, 1.0]) * jnp.array(
        [cw_full, ch_full, cw_full, ch_full])
    use_crop = jnp.logical_and(mode != 0, any_ok)
    rect = jnp.where(use_crop, rects[first_ok], full)
    return CropSample(rect, off)


def _augment_one(img: jnp.ndarray, boxes: jnp.ndarray, valid: jnp.ndarray,
                 key: jax.Array, out_size: int, mean: jnp.ndarray,
                 num_trials: int):
    """img [S0, S0, 3] f32 RGB raw scale; boxes absolute [M, 4]."""
    s0h, s0w = img.shape[0], img.shape[1]
    k_photo, k_geom, k_flip = jax.random.split(key, 3)

    img = photometric_distort(img, k_photo)
    img = img - mean  # out-of-bounds fill below becomes the mean

    sample = _sample_geometry(k_geom, boxes, valid, float(s0w), float(s0h),
                              num_trials)
    x1, y1, x2, y2 = sample.rect
    cw, ch = x2 - x1, y2 - y1
    # Source rect in IMAGE coords (canvas minus the expand offset).
    ix1, iy1 = x1 - sample.offset[0], y1 - sample.offset[1]
    s = float(out_size)
    scale = jnp.stack([s / ch, s / cw])
    trans = jnp.stack([-iy1 * s / ch, -ix1 * s / cw])
    out = jax.image.scale_and_translate(
        img, (out_size, out_size, img.shape[2]), (0, 1), scale, trans,
        method="linear")

    # Boxes: canvas coords -> crop coords -> [0, 1], with center-keep.
    cboxes = boxes + jnp.concatenate([sample.offset, sample.offset])
    centers = (cboxes[:, :2] + cboxes[:, 2:]) / 2.0
    keep = jnp.logical_and(
        jnp.logical_and(x1 < centers[:, 0], y1 < centers[:, 1]),
        jnp.logical_and(x2 > centers[:, 0], y2 > centers[:, 1]))
    valid = jnp.logical_and(valid, keep)
    nb = jnp.stack([
        jnp.clip(jnp.maximum(cboxes[:, 0], x1) - x1, 0.0, cw) / cw,
        jnp.clip(jnp.maximum(cboxes[:, 1], y1) - y1, 0.0, ch) / ch,
        jnp.clip(jnp.minimum(cboxes[:, 2], x2) - x1, 0.0, cw) / cw,
        jnp.clip(jnp.minimum(cboxes[:, 3], y2) - y1, 0.0, ch) / ch,
    ], axis=1)

    # Mirror (p = 1/2).
    do_flip = jax.random.bernoulli(k_flip)
    out = jnp.where(do_flip, out[:, ::-1, :], out)
    flipped = jnp.stack([1.0 - nb[:, 2], nb[:, 1],
                         1.0 - nb[:, 0], nb[:, 3]], axis=1)
    nb = jnp.where(do_flip, flipped, nb)
    return out, nb, valid


@functools.partial(jax.jit, static_argnames=("out_size", "num_trials"))
def augment_batch(images: jnp.ndarray, boxes: jnp.ndarray,
                  valid: jnp.ndarray, key: jax.Array, out_size: int = 320,
                  mean: Tuple[float, float, float] = (104.0, 117.0, 123.0),
                  num_trials: int = 50):
    """Batched on-device augmentation.

    Args:
      images: [B, S0, S0, 3] float32 RGB, raw pixel scale (host-staged).
      boxes: [B, M, 4] absolute staging-pixel point-form.
      valid: [B, M] bool.
      key: PRNG key (fold in the step index for per-step randomness).
      mean: per-channel mean in the reference's BGR order (config MEANS /
        VOC_MEANS). Images here are already RGB (StagingTransform flips),
        so the mean is reversed before subtraction — matching the host
        path, which subtracts in BGR *before* the RGB flip.
    Returns (images [B, out, out, 3] mean-subtracted, boxes [B, M, 4]
    normalized, valid [B, M]).
    """
    mean_arr = jnp.asarray(mean, jnp.float32)[::-1]
    images = images.astype(jnp.float32)  # uint8-staged pixels -> f32
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(
        lambda i, b, v, k: _augment_one(i, b, v, k, out_size, mean_arr,
                                        num_trials)
    )(images, boxes, valid, keys)


class StagingTransform:
    """Host-side stage for the on-device pipeline: squash-resize to the
    staging canvas, scale boxes, convert BGR->RGB. No randomness.

    Pixels are staged as uint8 (raw 0-255 scale): 4x less host->device
    traffic than f32, and integer pixels match the reference pipeline's
    input distribution (its ConvertFromInts starts from uint8 images).
    augment_batch converts to f32 on device.
    """

    def __init__(self, staging_size: int):
        self.size = staging_size

    def __call__(self, img, boxes, labels, rng=None):
        import cv2
        import numpy as np
        h, w = img.shape[:2]
        out = cv2.resize(img, (self.size, self.size),
                         interpolation=cv2.INTER_LINEAR)[:, :, ::-1]
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
        scale = np.array([self.size / w, self.size / h] * 2, np.float32)
        return (np.ascontiguousarray(out),
                boxes.astype(np.float32) * scale, labels)
