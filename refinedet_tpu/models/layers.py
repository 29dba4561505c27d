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


def max_pool_2x2(x: jnp.ndarray, ceil_mode: bool = False) -> jnp.ndarray:
    """2x2 stride-2 max pool over NHWC, with torch-style ceil_mode.

    ceil_mode pads the bottom/right edge with -inf so odd spatial dims round
    up (torch MaxPool2d(ceil_mode=True), used for pool3 'C').
    """
    h, w = x.shape[1], x.shape[2]
    if ceil_mode and (h % 2 or w % 2):
        pad_h, pad_w = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))
