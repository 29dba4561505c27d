"""Variance-scaled box encode/decode.

TPU-native counterpart of ``/root/reference/layers/box_utils.py:162-205``:
encode maps matched GT point-form boxes to (cxcy offset, log-wh) targets
relative to center-size priors; decode inverts it. The ``log(wh + 1e-5)``
epsilon and the variance ordering [center, size] are preserved exactly for
numerical parity with the reference.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

ENCODE_EPS = 1e-5


def encode(matched: jnp.ndarray, priors: jnp.ndarray,
           variances: Sequence[float]) -> jnp.ndarray:
    """Encode point-form ``matched`` [...,4] against center-size ``priors``.

    Returns smooth-L1 regression targets [..., 4].
    """
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(g_wh + ENCODE_EPS) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


# Cap on the wh exponent in decode. The reference's torch decode
# (box_utils.py:200-205) is unclamped and overflows to inf for degenerate
# predictions (|loc*variance| > ~88 in f32), which poisons downstream
# matching with inf-inf = NaN during early training. exp(30) ~ 1e13 is far
# beyond any physical box, so clamping there is behavior-preserving for any
# non-degenerate input while keeping gradients finite.
DECODE_MAX_EXP = 30.0


def decode(loc: jnp.ndarray, priors: jnp.ndarray,
           variances: Sequence[float]) -> jnp.ndarray:
    """Decode loc predictions [...,4] against center-size priors [...,4].

    Returns point-form boxes [..., 4]. Matches box_utils.py:187-205.
    """
    cxcy = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh_exp = jnp.clip(loc[..., 2:] * variances[1],
                      -DECODE_MAX_EXP, DECODE_MAX_EXP)
    wh = priors[..., 2:] * jnp.exp(wh_exp)
    mins = cxcy - wh / 2
    maxs = mins + wh
    return jnp.concatenate([mins, maxs], axis=-1)
