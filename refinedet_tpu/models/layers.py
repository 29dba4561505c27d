"""Shared model building blocks (NHWC, TPU-friendly).

Counterparts of the reference's small modules: L2Norm
(``/root/reference/layers/modules/l2norm.py:7-24``) and the max-pool variants
used by the VGG trunk (``/root/reference/models/refinedet.py:177-180``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class L2Norm(nn.Module):
    """Channelwise L2 normalization with a learned per-channel scale.

    Matches l2norm.py semantics: x / (||x||_2 + 1e-10) * weight, with the
    norm taken over the channel axis. ``initial_scale`` is 10 for conv4_3
    and 8 for conv5_3 (refinedet.py:41-42).
    """

    channels: int
    initial_scale: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param(
            "weight", nn.initializers.constant(self.initial_scale),
            (self.channels,), jnp.float32)
        x32 = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True)) + 1e-10
        out = x32 / norm * weight
        return out.astype(self.dtype)


class QuantConv(nn.Module):
    """Int8 post-training-quantized convolution (inference only).

    TPU-native serving-path addition (no reference counterpart — the
    reference serves f32 on GPU). Symmetric quantization with
    **per-input-channel activation scales folded into the weights**:
    ``x_q[..., c] = round(x[..., c] / in_scale[c])`` and the converter
    (quant/ptq.py) quantizes ``W'[..., c, o] = W[..., c, o] * in_scale[c]``
    per output channel into ``kernel_q`` × ``w_scale[o]``, so
    ``conv(x_q, kernel_q) * w_scale`` reconstructs ``conv(x, W)`` with no
    per-tensor activation bottleneck (SmoothQuant-style folding at zero
    MXU cost — the per-channel divide is one fused VPU multiply). The conv
    runs int8×int8→int32 on the MXU at twice the bf16 rate. Zero padding
    is exact under symmetric quantization (no zero-point).

    Parameters are filled by ``refinedet_tpu.quant.quantize_variables`` —
    ``init`` only provides the tree template.
    """

    features: int
    kernel: int
    strides: int = 1
    padding: int = 0
    dilation: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.kernel
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (k, k, cin, self.features), jnp.int8)
        w_scale = self.param("w_scale", nn.initializers.ones,
                             (self.features,), jnp.float32)
        in_scale = self.param("in_scale", nn.initializers.ones,
                              (cin,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)

        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / in_scale)),
                      -127.0, 127.0).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(
            xq.shape, kernel_q.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xq, kernel_q,
            window_strides=(self.strides, self.strides),
            padding=[(self.padding, self.padding)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        out = y.astype(jnp.float32) * w_scale + bias
        return out.astype(self.dtype)


@jax.custom_vjp
def _pool2x2_slice_bwd(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _pool2x2_fwd(x):
    y = nn.max_pool(x, (2, 2), strides=(2, 2))
    return y, (x, y)


def _pool2x2_bwd(res, g):
    """Exact first-tie-wins 2x2s2 maxpool backward without select_and_scatter.

    XLA lowers reduce_window's VJP to select_and_scatter, which the train
    -step trace measured at ~9% of the b128 step (tools/TRACE_NOTES.md).
    For NON-OVERLAPPING 2x2 stride-2 windows the backward is expressible
    as 4 strided slices + compares + an interleave — all fusible
    elementwise traffic. Tie semantics match select_and_scatter (and torch
    MaxPool2d): the first window element in row-major order ((0,0), (0,1),
    (1,0), (1,1)) that equals the max receives the whole gradient
    (equality against y is exact: the max IS one of the four inputs).
    """
    x, y = res
    x00 = x[:, 0::2, 0::2]
    x01 = x[:, 0::2, 1::2]
    x10 = x[:, 1::2, 0::2]
    w00 = x00 == y
    w01 = (x01 == y) & ~w00
    w10 = (x10 == y) & ~(w00 | w01)
    w11 = ~(w00 | w01 | w10)
    zero = jnp.zeros_like(g)
    g00 = jnp.where(w00, g, zero)
    g01 = jnp.where(w01, g, zero)
    g10 = jnp.where(w10, g, zero)
    g11 = jnp.where(w11, g, zero)
    b, h, w, c = g.shape
    # interleave columns then rows: [B,h,w,2,C] -> [B,h,2w,C] -> [B,2h,2w,C]
    row0 = jnp.stack([g00, g01], axis=3).reshape(b, h, 2 * w, c)
    row1 = jnp.stack([g10, g11], axis=3).reshape(b, h, 2 * w, c)
    out = jnp.stack([row0, row1], axis=2).reshape(b, 2 * h, 2 * w, c)
    return (out,)


_pool2x2_slice_bwd.defvjp(_pool2x2_fwd, _pool2x2_bwd)

# Backward implementation switch, overridable for A/B measurement
# (tools/bench_pool_backward.py): "select_scatter" = XLA's default
# reduce_window VJP; "slice" = the custom first-tie-wins VJP above.
# Measured on-chip (b128/320 full train step, chained timing):
# select_scatter 222.9 ms/step vs slice 273.6 — the slice variant's
# stack+reshape interleave costs more in layout copies than
# select_and_scatter's ~9% share saves (same failure mode as the
# reshape-based pooling probe, see CLAUDE.md), so the default stays
# select_scatter and "slice" remains as a documented negative result.
POOL_BACKWARD = "select_scatter"


def max_pool_2x2(x: jnp.ndarray, ceil_mode: bool = False) -> jnp.ndarray:
    """2x2 stride-2 max pool over NHWC, with torch-style ceil_mode.

    ceil_mode pads the bottom/right edge with -inf so odd spatial dims round
    up (torch MaxPool2d(ceil_mode=True), used for pool3 'C'). All of the
    reference's pools are 2x2 stride 2 (models/refinedet.py:177-188), so
    the non-overlapping custom backward applies to every pool.
    """
    h, w = x.shape[1], x.shape[2]
    if ceil_mode and (h % 2 or w % 2):
        pad_h, pad_w = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-jnp.inf)
    if POOL_BACKWARD == "slice":
        return _pool2x2_slice_bwd(x)
    return nn.max_pool(x, (2, 2), strides=(2, 2))
