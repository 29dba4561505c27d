"""Post-training int8 quantization (PTQ) for the RefineDet serving path.

TPU-native serving addition with no reference counterpart (the reference
serves f32 on GPU; see /root/reference/eval_refinedet_coco.py): the v5e MXU
runs int8 x int8 -> int32 at twice the bf16 rate — measured 1.44x
end-to-end at batch 128 in the default configuration, 1.52x fully
quantized (see README perf table).

Scheme — symmetric PTQ with per-channel everything:
  * weights:     per-output-channel int8, ``w_scale[o] = max|W'[..., o]|/127``
  * activations: per-INPUT-channel scales folded into the weights
    (SmoothQuant-style): ``x_q[c] = round(x[c] / in_scale[c])`` and
    ``W' = W * in_scale`` before weight quantization, so the fold costs
    nothing on the MXU. ``in_scale[c]`` is a clip point (amax or a high
    percentile) of the calibration stream, recorded per channel by the
    'calib' sow in RefineDet._conv.
  * quantized layers: VGG trunk, extras, TCB convs, minus
    DEFAULT_QUANT_SKIP (early VGG convs — the dominant accuracy cost for
    ~15% of FLOPs). Heads, conv1_1, L2Norm and deconvs stay bf16/f32.

Typical use::

    model = build_refinedet('test', 320, 21, dtype=jnp.bfloat16)
    ...restore variables...
    model_q, variables_q = quantize_model(model, variables, calib_batches)
    boxes, scores = jax.jit(model_q.apply)(variables_q, images)
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from refinedet_tpu.models.refinedet import CALIB_PERCENTILES

_STATS_SUFFIX = "_absstats"
_MEAN_SUFFIX = "_mean"
# activation clip-point choices -> index into the recorded stats vector
# [amax, *CALIB_PERCENTILES] (99.99, 99.9, 99.0)
ACT_STATS = {"amax": 0, "p9999": 1, "p999": 2, "p99": 3}
assert len(ACT_STATS) == 1 + len(CALIB_PERCENTILES)

# Early VGG convs kept bf16 by default: their image-like, high-dynamic-
# range activations are the dominant int8 accuracy cost (skipping them
# recovers ~1/3 of the quantization AP gap on the trained smoke for ~15%
# of the FLOPs; see tools/smoke_int8.py ablation), while TCB-side
# skipping measures as pure cost.
DEFAULT_QUANT_SKIP = ("vgg_conv1_2", "vgg_conv2_1")


def calibrate_amax(model, variables, batches: Iterable,
                   return_means: bool = False):
    """Run calibration batches through the f32/bf16 model and collect the
    per-conv-input |x| statistics recorded by the 'calib' sow: a
    [amax, p99.99, p99.9, p99] x [cin] matrix per quantized conv
    (rows per CALIB_PERCENTILES, columns per input channel).

    ``batches`` yields image arrays [B,H,W,3] (already preprocessed exactly
    as at inference). Returns {conv_name: stats} with the elementwise
    running max over all batches (exact for amax, a slight overestimate
    for the percentiles of the pooled stream — the right direction for a
    clip point).

    With ``return_means=True``, returns ``(stats, means)`` where ``means``
    is {conv_name: E[x] per input channel} averaged over the stream
    (weighted by batch size) — the input to PTQ bias correction
    (``bias_correction_delta``).
    """

    @jax.jit
    def run(v, images):
        _, state = model.raw_forward(v, images, train=False,
                                     mutable=["calib"])
        return state["calib"]

    stats: Dict[str, np.ndarray] = {}
    mean_sums: Dict[str, np.ndarray] = {}
    n = 0
    weight = 0.0
    for images in batches:
        captured = jax.device_get(run(variables, jnp.asarray(images)))
        b = float(np.shape(images)[0])
        for key, val in captured.items():
            val = np.asarray(val, np.float32)
            if key.endswith(_STATS_SUFFIX):
                name = key[:-len(_STATS_SUFFIX)]
                prev = stats.get(name)
                stats[name] = val if prev is None else np.maximum(prev, val)
            elif key.endswith(_MEAN_SUFFIX):
                # per-batch mean over B*H*W positions; H*W is constant per
                # conv, so weighting by B makes the pooled mean exact even
                # with a ragged final batch
                name = key[:-len(_MEAN_SUFFIX)]
                mean_sums[name] = mean_sums.get(name, 0.0) + b * val
        n += 1
        weight += b
    if n == 0:
        raise ValueError("calibration stream was empty")
    if not return_means:
        return stats
    means = {name: (s / weight).astype(np.float32)
             for name, s in mean_sums.items()}
    return stats, means


def bias_correction_delta(w: np.ndarray, kernel_q: np.ndarray,
                          w_scale: np.ndarray, in_scale: np.ndarray,
                          mean_x: np.ndarray) -> np.ndarray:
    """Expected-output-error bias correction (DFQ-style, Nagel et al.
    2019): the int8 conv's effective weight ``kernel_q * w_scale /
    in_scale`` differs from the f32 ``w`` by the weight-rounding residual,
    which turns the calibration stream's per-channel input mean E[x] into
    a systematic per-output-channel offset. Returns ``delta[o] =
    sum_{kh,kw,c} (w - w_eff)[kh,kw,c,o] * E[x[c]]`` to ADD to the bias.

    Approximations (both standard): activation rounding error is treated
    as zero-mean (symmetric round-to-nearest; percentile clipping touches
    only the top 0.01%), and E[x] is applied at every tap including
    zero-padded borders (pad zeros quantize exactly, so the correction
    slightly overcounts border taps of edge pixels).
    """
    w = np.asarray(w, np.float32)
    w_eff = (kernel_q.astype(np.float32)
             * np.asarray(w_scale, np.float32)[None, None, None, :]
             / np.asarray(in_scale, np.float32)[None, None, :, None])
    return np.einsum("hwco,c->o", w - w_eff,
                     np.asarray(mean_x, np.float32)).astype(np.float32)


def _clip_point(stat: Union[np.ndarray, float],
                act_stat: str) -> np.ndarray:
    """Per-input-channel clip points [cin] from a stats matrix (or a
    scalar/vector amax, for hand-built calibration dicts)."""
    stat = np.asarray(stat, np.float32)
    if stat.ndim <= 1:  # scalar or per-channel amax given directly
        return np.atleast_1d(stat)
    return stat[ACT_STATS[act_stat]]


def quantize_variables(model_q, variables, amax: Dict,
                       act_stat: str = "p9999",
                       means: Optional[Dict] = None,
                       hessians: Optional[Dict] = None,
                       gptq_cache: Optional[Dict] = None):
    """Fill the quantized model's variable tree from trained f32 variables.

    ``model_q`` is the ``quant=True`` twin (same size/num_classes/use_bn);
    its param template decides which convs are quantized (QuantConv leaves
    carry 'kernel_q'). Weights get per-output-channel scales; the input
    scale comes from ``amax`` (calibrate_amax stats vectors, or plain
    floats) with the ``act_stat`` clip point per input channel — 'p9999'
    (default) clips the top 0.01% activation outliers (best AP on the
    trained smoke, tools/smoke_int8.py); 'amax', 'p999' and 'p99' are the
    alternatives. Percentile clip points are floored at 1e-3 x the channel
    max so sparse channels don't saturate.

    ``hessians`` (from ``quant.gptq.accumulate_hessians``) switches the
    weight rounding of the covered convs from round-to-nearest to the
    second-order GPTQ solver (``quant.gptq.gptq_round``) — same scales,
    better grid points.

    ``gptq_cache`` (a caller-owned dict) memoizes the GPTQ result per
    conv across calls: the solve's host-side K x K inverse + Cholesky is
    minutes for the big layers (conv6: K = 9216), and serving-arm sweeps
    (tools/ablate_int8.py) quantize the SAME trained weights under the
    same shared calibration several times (skip-set and bias-correction
    twins have identical kernels). Entries are reused only when the
    folded scales match bit-exactly, so a cache shared across different
    weights/calibrations degrades to a recompute, never a wrong kernel.
    """
    template = jax.eval_shape(
        lambda: model_q.init(jax.random.PRNGKey(0)))
    params = variables["params"]
    new_params = {}
    for name, leaves in template["params"].items():
        if "kernel_q" not in leaves:
            if name not in params:
                raise KeyError(f"missing f32 params for module {name!r}")
            new_params[name] = params[name]
            continue
        if name not in amax:
            raise KeyError(
                f"no calibration amax for quantized conv {name!r}; "
                f"calibrated: {sorted(amax)}")
        w = np.asarray(params[name]["kernel"], np.float32)
        b = np.asarray(params[name]["bias"], np.float32)
        # per-input-channel activation scales, folded into the weights
        # (see QuantConv): x_q[c] = x[c] / in_scale[c], W' = W * in_scale
        clip = _clip_point(amax[name], act_stat)
        stat = np.asarray(amax[name], np.float32)
        if stat.ndim == 2:
            # floor percentile clip points against sparse channels whose
            # high percentile is ~0 while the max is not (the scale would
            # saturate every non-zero value to +-127)
            clip = np.maximum(clip, 1e-3 * stat[0])
        # Calibration-dead channels (amax == 0 on the calib stream, e.g. a
        # ReLU unit that never fired on the ~16 calib images) would get an
        # in_scale of ~1e-12: the folded weight column rounds to all-zero
        # int8 and any eval-time activation in that channel is silently
        # dropped. Floor their clip point at a fraction of the layer-wide
        # max so they degrade gracefully instead.
        amax_vec = stat[0] if stat.ndim == 2 else np.atleast_1d(stat)
        layer_max = float(amax_vec.max()) if amax_vec.size else 0.0
        dead = amax_vec <= 0.0
        if dead.any() and layer_max > 0.0:
            import warnings
            warnings.warn(
                f"PTQ: {name!r} has {int(dead.sum())}/{dead.size} "
                "calibration-dead input channels (|x| max 0 on the "
                "calibration stream); flooring their clip point at 5% of "
                "the layer-wide max. Consider more calibration images.")
            clip = np.where(np.broadcast_to(dead, clip.shape),
                            0.05 * layer_max, clip)
        in_scale = np.maximum(clip / 127.0, 1e-12).astype(np.float32)
        if in_scale.shape == (1,) and w.shape[2] != 1:
            in_scale = np.broadcast_to(in_scale, (w.shape[2],)).copy()
        w_folded = w * in_scale[None, None, :, None]
        w_scale = np.abs(w_folded).max(axis=(0, 1, 2)) / 127.0
        w_scale = np.maximum(w_scale, 1e-12).astype(np.float32)
        if hessians is not None and name in hessians:
            from refinedet_tpu.quant.gptq import gptq_round
            cached = None if gptq_cache is None else gptq_cache.get(name)
            if cached is not None and \
                    np.array_equal(cached[0], in_scale) and \
                    np.array_equal(cached[1], w_scale):
                kernel_q = cached[2]
            else:
                kernel_q = gptq_round(w, in_scale, w_scale, hessians[name])
                if gptq_cache is not None:
                    gptq_cache[name] = (in_scale.copy(), w_scale.copy(),
                                        kernel_q)
        else:
            kernel_q = np.clip(np.round(w_folded / w_scale),
                               -127, 127).astype(np.int8)
        if means is not None:
            if name not in means:
                raise KeyError(f"bias correction requested but no input "
                               f"mean for quantized conv {name!r}; "
                               f"calibrated: {sorted(means)}")
            b = b + bias_correction_delta(w, kernel_q, w_scale, in_scale,
                                          means[name])
        new_params[name] = {
            "kernel_q": jnp.asarray(kernel_q),
            "w_scale": jnp.asarray(w_scale),
            "in_scale": jnp.asarray(in_scale),
            "bias": jnp.asarray(b),
        }
    out = dict(variables)
    out["params"] = new_params
    out.pop("calib", None)
    return out


def calib_batches_from_dataset(dataset, transform, num_images: int,
                               batch_size: int):
    """Yield calibration batches of eval-preprocessed images from a
    dataset with the ``pull_image`` accessor (VOC/COCO/SSDD loaders)."""
    n = min(num_images, len(dataset))
    if n == 0:
        raise ValueError("dataset is empty; cannot calibrate")
    for b0 in range(0, n, batch_size):
        idx = range(b0, min(b0 + batch_size, n))
        imgs = []
        for i in idx:
            raw = dataset.pull_image(i)
            raw = raw[0] if isinstance(raw, tuple) else raw
            imgs.append(transform(raw))
        yield np.stack(imgs).astype(np.float32)


def quantize_model(model, variables, calib_batches: Iterable,
                   dtype=jnp.bfloat16,
                   amax: Optional[Dict] = None,
                   act_stat: str = "p9999",
                   quant_skip: tuple = DEFAULT_QUANT_SKIP,
                   bias_correct: bool = False,
                   weight_opt: str = "none",
                   weight_opt_names: Optional[tuple] = None):
    """One-call PTQ: calibrate on ``calib_batches`` (ignored if ``amax``
    given) and return (model_q, variables_q) — the int8 serving twin of
    ``model`` with the same detector/phase semantics. ``quant_skip``
    names convs to keep unquantized. ``bias_correct=True`` additionally
    folds the expected weight-rounding output error into each quantized
    conv's bias (``bias_correction_delta``) using the calibration
    stream's input means. ``weight_opt='gptq'`` replaces round-to-nearest
    with the second-order rounding solver (quant/gptq.py), which needs a
    second pass over ``calib_batches`` for the per-layer input Hessians;
    ``weight_opt_names`` optionally restricts it to a subset of convs
    (default: every quantized conv)."""
    from refinedet_tpu.models.builder import build_refinedet

    if weight_opt not in ("none", "gptq"):
        raise ValueError(f"weight_opt must be 'none' or 'gptq', "
                         f"got {weight_opt!r}")
    if weight_opt == "gptq":
        # the Hessian pass re-consumes the stream; materialize generators
        calib_batches = list(calib_batches)
    means = None
    if amax is None:
        if bias_correct:
            amax, means = calibrate_amax(model, variables, calib_batches,
                                         return_means=True)
        else:
            amax = calibrate_amax(model, variables, calib_batches)
    elif bias_correct or weight_opt == "gptq":
        raise ValueError("bias_correct/weight_opt need the calibration "
                         "stream; pass calib_batches instead of a "
                         "precomputed amax")
    hessians = None
    if weight_opt == "gptq":
        from refinedet_tpu.quant.gptq import accumulate_hessians
        hessians = accumulate_hessians(model, variables, calib_batches,
                                       names=weight_opt_names)
    model_q = build_refinedet(
        "test", model.size, model.num_classes, detector=model.detect,
        use_bn=model.use_bn, dtype=dtype, quant=True,
        quant_skip=quant_skip)
    return model_q, quantize_variables(model_q, variables, amax,
                                       act_stat=act_stat, means=means,
                                       hessians=hessians)
