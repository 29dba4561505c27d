"""Shared model building blocks (NHWC, TPU-friendly).

Counterparts of the reference's small modules: L2Norm
(``/root/reference/layers/modules/l2norm.py:7-24``) and the max-pool variants
used by the VGG trunk (``/root/reference/models/refinedet.py:177-180``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
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
