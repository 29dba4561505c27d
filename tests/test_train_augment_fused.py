"""Train step with the fused on-device augmentation + BN/bf16 variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from refinedet_tpu.config import TrainConfig
from refinedet_tpu.models import build_refinedet
from refinedet_tpu.train import (create_train_state, make_optimizer,
                                 make_train_step)


def _staged_batch(rng, b=2, s0=640, m=6):
    images = rng.uniform(0, 255, (b, s0, s0, 3)).astype(np.float32)
    boxes = np.zeros((b, m, 4), np.float32)
    labels = np.zeros((b, m), np.int32)
    valid = np.zeros((b, m), bool)
    for i in range(b):
        n = rng.randint(1, 4)
        xy = rng.uniform(30, s0 * 0.5, (n, 2))
        wh = rng.uniform(60, s0 * 0.4, (n, 2))
        boxes[i, :n] = np.hstack([xy, np.minimum(xy + wh, s0 - 1.0)])
        labels[i, :n] = 1
        valid[i, :n] = True
    return images, boxes, labels, valid


def test_fused_augment_train_step(rng):
    model = build_refinedet("train", 320, 2)
    cfg = TrainConfig(batch_size=2, max_boxes=6, lr=1e-5, seed=1,
                      on_device_augment=True, mean=(98.1, 98.1, 98.1))
    tx = make_optimizer(lambda s: cfg.lr)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)
    step = make_train_step(model, tx, cfg, on_device_augment=True,
                           augment_mean=cfg.mean)
    batch = tuple(jnp.asarray(x) for x in _staged_batch(rng))
    state, m1 = step(state, *batch)
    state, m2 = step(state, *batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # different steps fold different keys -> different augmented batches
    assert float(m1["loss"]) != float(m2["loss"])
    assert int(state.step) == 2


def test_bn_bf16_train_step(rng):
    model = build_refinedet("train", 320, 2, use_bn=True,
                            dtype=jnp.bfloat16)
    cfg = TrainConfig(batch_size=2, max_boxes=6, lr=1e-5,
                      grad_clip_norm=10.0)
    tx = make_optimizer(lambda s: cfg.lr, grad_clip_norm=cfg.grad_clip_norm)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)
    assert state.batch_stats is not None
    step = make_train_step(model, tx, cfg)
    from test_train_step import _fake_batch
    batch = tuple(jnp.asarray(x) for x in _fake_batch(rng, b=2, m=6))
    old_stats = jax.tree.leaves(state.batch_stats)[0].copy()
    state, metrics = step(state, *batch)
    assert np.isfinite(float(metrics["loss"]))
    new_stats = jax.tree.leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(old_stats), np.asarray(new_stats))
