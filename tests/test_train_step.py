import numpy as np
import jax
import jax.numpy as jnp
import pytest

from refinedet_tpu.config import TrainConfig
from refinedet_tpu.models import build_refinedet
from refinedet_tpu.train import (create_train_state, make_lr_schedule,
                                 make_optimizer, make_train_step)


def test_lr_schedule_matches_reference_semantics():
    # epoch_size 10, max_epoch 9 -> steps at it 60 (2/3) and 80 (8/9).
    sched = make_lr_schedule(1e-3, 0.1, epoch_size=10, max_epoch=9,
                             warmup_epochs=5, warmup_init=1e-6)
    assert float(sched(0)) == pytest.approx(1e-6)
    # mid-warmup: linear
    assert float(sched(25)) == pytest.approx(1e-6 + (1e-3 - 1e-6) * 25 / 50)
    assert float(sched(50)) == pytest.approx(1e-3)
    assert float(sched(59)) == pytest.approx(1e-3)
    assert float(sched(60)) == pytest.approx(1e-4)
    assert float(sched(80)) == pytest.approx(1e-5)


def test_optimizer_matches_torch_sgd_semantics():
    # One param, two steps; verify against hand-computed torch SGD w/
    # momentum 0.9 + wd 5e-4 at fixed lr.
    import optax
    tx = make_optimizer(lambda step: 0.1, momentum=0.9, weight_decay=5e-4)
    p = jnp.asarray([1.0])
    g = jnp.asarray([0.5])
    opt = tx.init(p)
    # step 1: grad' = 0.5 + 5e-4*1.0 = 0.5005 ; buf = 0.5005 ; p -= .05005
    up, opt = tx.update(g, opt, p)
    p = optax.apply_updates(p, up)
    np.testing.assert_allclose(float(p[0]), 1.0 - 0.1 * 0.5005, rtol=1e-6)
    # step 2: grad' = 0.5 + 5e-4*p ; buf = 0.9*0.5005 + grad'
    g2p = 0.5 + 5e-4 * float(p[0])
    buf2 = 0.9 * 0.5005 + g2p
    want = float(p[0]) - 0.1 * buf2
    up, opt = tx.update(g, opt, p)
    p = optax.apply_updates(p, up)
    np.testing.assert_allclose(float(p[0]), want, rtol=1e-6)


@pytest.fixture(scope="module")
def tiny_setup():
    # A 320 model is heavy for CPU tests; still the smallest real config.
    model = build_refinedet("train", 320, 2)
    cfg = TrainConfig(batch_size=2, max_boxes=8, lr=1e-3)
    sched = make_lr_schedule(cfg.lr, cfg.gamma, epoch_size=10, max_epoch=9)
    tx = make_optimizer(sched, cfg.momentum, cfg.weight_decay)
    # The step donates its input state, so hand each test a fresh one.
    fresh_state = lambda: create_train_state(model, jax.random.PRNGKey(0), tx)
    step = make_train_step(model, tx, cfg)
    return model, fresh_state, step


def _fake_batch(rng, b=2, size=320, m=8):
    images = rng.randn(b, size, size, 3).astype(np.float32)
    boxes = np.zeros((b, m, 4), np.float32)
    labels = np.zeros((b, m), np.int32)
    valid = np.zeros((b, m), bool)
    for i in range(b):
        n = rng.randint(1, 4)
        xy = rng.uniform(0.1, 0.5, (n, 2))
        wh = rng.uniform(0.2, 0.4, (n, 2))
        boxes[i, :n] = np.hstack([xy, np.minimum(xy + wh, 1.0)])
        labels[i, :n] = 1
        valid[i, :n] = True
    return images, boxes, labels, valid


def test_train_step_decreases_loss(tiny_setup, rng):
    _, fresh_state, step = tiny_setup
    state = fresh_state()
    batch = _fake_batch(rng)
    args = tuple(jnp.asarray(x) for x in batch)
    losses = []
    for _ in range(4):
        state, metrics = step(state, *args)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits a fixed batch
    assert int(state.step) == 4


def test_train_step_zero_gt_is_stable(tiny_setup, rng):
    _, fresh_state, step = tiny_setup
    state = fresh_state()
    images, boxes, labels, valid = _fake_batch(rng)
    valid[:] = False
    labels[:] = 0
    state, metrics = step(state, *(jnp.asarray(x) for x in
                                   (images, boxes, labels, valid)))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["num_pos_arm"]) == 0
