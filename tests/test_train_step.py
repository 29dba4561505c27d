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


def test_ema_tracks_manual_formula(tiny_setup, rng):
    """EMA params follow e_t = d_t*e_{t-1} + (1-d_t)*p_t with the
    warmup-ramped decay d_t = min(ema_decay, (1+t)/(10+t)); raw params
    are identical to a no-EMA run (EMA is observe-only)."""
    model, fresh_state, _ = tiny_setup
    cfg = TrainConfig(batch_size=2, max_boxes=8, lr=1e-3, ema_decay=0.9)
    sched = make_lr_schedule(cfg.lr, cfg.gamma, epoch_size=10, max_epoch=9)
    tx = make_optimizer(sched, cfg.momentum, cfg.weight_decay)
    state = create_train_state(model, jax.random.PRNGKey(0), tx, ema=True)
    step = make_train_step(model, tx, cfg)

    batch = tuple(jnp.asarray(x) for x in _fake_batch(rng))
    expect = jax.tree.map(np.asarray, state.params)  # e_0 = p_0
    for t in range(1, 4):
        state, _ = step(state, *batch)
        params = jax.tree.map(np.asarray, state.params)
        d = min(0.9, (1.0 + t) / (10.0 + t))
        expect = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                              expect, params)
        got = jax.tree.map(np.asarray, state.ema_params)
        for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(got)):
            np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7)
    # EMA differs from the raw params (it actually averaged something)
    diffs = [np.abs(a - b).max() for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, state.params)),
        jax.tree.leaves(got))]
    assert max(diffs) > 0


def test_ema_checkpoint_roundtrip_and_loader(tmp_path, rng):
    """ema_params survive the Orbax round trip and the eval drivers'
    make_loader(use_ema=True) serves them; use_ema on an EMA-less
    checkpoint errors instead of silently serving raw weights."""
    from refinedet_tpu.train import CheckpointManager
    from eval_refinedet_coco import make_loader

    model = build_refinedet("train", 320, 2)
    sched = make_lr_schedule(1e-3, 0.1, epoch_size=10, max_epoch=9)
    tx = make_optimizer(sched)
    state = create_train_state(model, jax.random.PRNGKey(0), tx, ema=True)
    # make EMA distinguishable from raw params
    state = state.replace(ema_params=jax.tree.map(
        lambda p: p + 0.125, state.ema_params))
    ckpt = CheckpointManager(str(tmp_path), "RefineDet320_TEST")
    path = ckpt.save(state, 10)

    variables = make_loader(model, use_ema=True)(path)
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray,
                                                 state.ema_params)),
                    jax.tree.leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    raw = make_loader(model)(path)
    leaf = jax.tree.leaves(raw["params"])[0]
    np.testing.assert_array_equal(
        np.asarray(leaf),
        np.asarray(jax.tree.leaves(jax.tree.map(np.asarray,
                                                state.params))[0]))

    no_ema = create_train_state(model, jax.random.PRNGKey(0), tx)
    path2 = ckpt.save(no_ema, 20)
    with pytest.raises(ValueError, match="ema_params"):
        make_loader(model, use_ema=True)(path2)
