"""Weight-initialization helpers (API parity with the reference's
``weights_init.py:6-50`` mmcv-style functions and the train-side xavier
init at ``train_refinedet.py:295-305``).

In Flax, initialization is declarative (kernel_init per layer — the model
in models/refinedet.py already uses He for the VGG trunk and Xavier for
heads/extras/TCB, matching the reference's kaiming+xavier split). These
helpers exist for users porting reference code that initializes imperatively
and for re-initializing imported param trees.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def constant_init(shape, val: float, bias: float = 0.0):
    return {"kernel": np.full(shape, val, np.float32),
            "bias": np.full(shape[-1], bias, np.float32)}


def _fans(shape):
    """torch/mmcv fan convention for HWIO kernels: both fans include the
    receptive-field size (fan_in = I*H*W, fan_out = O*H*W); dense [I, O]
    kernels degenerate to (I, O)."""
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = int(shape[-2]) * receptive if len(shape) > 1 else int(shape[0])
    fan_out = int(shape[-1]) * receptive
    return fan_in, fan_out


def xavier_init(rng, shape, gain: float = 1.0, distribution: str = "normal"):
    fan_in, fan_out = _fans(shape)
    if distribution == "uniform":
        a = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return rng.uniform(-a, a, shape).astype(np.float32)
    std = gain * np.sqrt(2.0 / (fan_in + fan_out))
    return (rng.randn(*shape) * std).astype(np.float32)


def normal_init(rng, shape, mean: float = 0.0, std: float = 1.0):
    return (rng.randn(*shape) * std + mean).astype(np.float32)


def uniform_init(rng, shape, a: float = 0.0, b: float = 1.0):
    return rng.uniform(a, b, shape).astype(np.float32)


def kaiming_init(rng, shape, a: float = 0.0, mode: str = "fan_out",
                 nonlinearity: str = "relu",
                 distribution: str = "normal"):
    fan_in, fan_out = _fans(shape)
    fan = fan_out if mode == "fan_out" else fan_in
    gain = np.sqrt(2.0 / (1 + a ** 2)) if nonlinearity == "leaky_relu" \
        else np.sqrt(2.0)
    if distribution == "uniform":
        bound = gain * np.sqrt(3.0 / fan)
        return rng.uniform(-bound, bound, shape).astype(np.float32)
    std = gain / np.sqrt(fan)
    return (rng.randn(*shape) * std).astype(np.float32)


def reinit_heads_xavier(params: Dict, seed: int = 0) -> Dict:
    """Re-initialize all non-VGG conv kernels with xavier-uniform + zero
    bias (the reference's weights_init applied to extras/heads/TCB,
    train_refinedet.py:166-175)."""
    rng = np.random.RandomState(seed)
    out = {}
    for name, leaf in params.items():
        if name.startswith("vgg_") or "L2Norm" in name:
            out[name] = leaf
            continue
        new_leaf = dict(leaf)
        if "kernel" in new_leaf:
            shape = np.asarray(new_leaf["kernel"]).shape
            new_leaf["kernel"] = xavier_init(rng, shape,
                                             distribution="uniform")
            new_leaf["bias"] = np.zeros(shape[-1], np.float32)
        out[name] = new_leaf
    return out
