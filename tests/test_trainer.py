"""Trainer-loop integration: pipelined logging, live plotter, checkpoints.

The Trainer logs metrics one step delayed (device_get only after the next
step is dispatched) — these tests pin that every iteration still produces
exactly one log line in the reference's format, that the LivePlotter sees
every logged iteration plus epoch boundaries, and that the final
checkpoint lands.
"""

import os

import numpy as np
import pytest

from refinedet_tpu.config import TrainConfig
from refinedet_tpu.data import COCODetection, SSDAugmentation
from refinedet_tpu.models import build_refinedet
from refinedet_tpu.train import Trainer
from refinedet_tpu.utils.plot import _LOG_RE, LivePlotter
from tests.data_fixtures import make_coco_dataset


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco"))
    make_coco_dataset(root, num_images=4, img_size=96)
    return root


def test_trainer_loop_logs_every_iter_and_checkpoints(tiny_coco, tmp_path):
    dataset = COCODetection(tiny_coco, [("sarship", "train")],
                            SSDAugmentation(320, (104, 117, 123)))
    cfg = TrainConfig(batch_size=2, max_boxes=8, lr=1e-5, max_epoch=2,
                      num_workers=0)
    save = str(tmp_path / "weights")
    lines = []
    live = LivePlotter(str(tmp_path / "viz"), render_every=100)
    trainer = Trainer(build_refinedet("train", 320, 2), dataset, cfg,
                      save_folder=save, num_devices=2,
                      log_fn=lines.append, live_plotter=live)
    assert trainer.epoch_size == 2
    trainer.train()

    # 2 epochs x 2 iters -> 4 log lines, each parseable by the
    # plot_curve-compatible regex, iterations in order with none dropped.
    assert len(lines) == 4
    iters = []
    for line in lines:
        m = _LOG_RE.search(line)
        assert m, line
        iters.append(int(m.group(1)))
    assert iters == [1, 2, 3, 4]

    # live plotter saw every iteration and both epoch folds
    assert live.iters == [1, 2, 3, 4]
    assert live.epochs == [1, 2]
    assert len(live.epoch_series["loss"]) == 2
    np.testing.assert_allclose(
        live.epoch_series["loss"][0],
        np.mean(live.series["loss"][:2]), rtol=1e-6)

    # final checkpoint written
    final_dirs = [d for d in os.listdir(save) if "final" in d]
    assert final_dirs, os.listdir(save)


def test_trainer_preemption_checkpoints_and_exits(tiny_coco, tmp_path):
    """A preemption signal mid-training checkpoints the live state under
    a 'preempt_eN' tag and returns cleanly instead of losing the epoch."""
    dataset = COCODetection(tiny_coco, [("sarship", "train")],
                            SSDAugmentation(320, (104, 117, 123)))
    cfg = TrainConfig(batch_size=2, max_boxes=8, lr=1e-5, max_epoch=50,
                      num_workers=0)
    save = str(tmp_path / "w")
    lines = []
    trainer = Trainer(build_refinedet("train", 320, 2), dataset, cfg,
                      save_folder=save, num_devices=2, log_fn=lines.append)

    fired = {"done": False}
    real_step = trainer.train_step

    def step_then_preempt(*a):
        out = real_step(*a)
        if not fired["done"]:
            import os as _os
            import signal as _sig
            fired["done"] = True
            _os.kill(_os.getpid(), _sig.SIGTERM)  # delivered in-process
        return out

    trainer.train_step = step_then_preempt
    state = trainer.train()
    # stopped long before max_epoch, with a preempt-tagged checkpoint
    assert int(np.asarray(state.step)) < 50 * trainer.epoch_size
    tags = [d for d in os.listdir(save) if "preempt_e" in d]
    assert tags, os.listdir(save)
    assert not [d for d in os.listdir(save) if d.endswith("_final")]


class _ToyDataset:
    """5-sample map-style dataset for loader-shape tests."""

    def __init__(self, n=5):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((8, 8, 3), float(i + 1), np.float32)
        boxes = np.array([[0.1, 0.1, 0.5, 0.5]], np.float32)
        labels = np.array([1], np.int64)
        return img, boxes, labels


def test_loader_pads_trailing_partial_batch():
    """drop_last=False yields ceil(n/bs) batches (the reference's
    epoch_size, train_refinedet.py:193), with the tail batch padded to the
    full static batch size by all-invalid samples."""
    from refinedet_tpu.data.loader import DataLoader

    loader = DataLoader(_ToyDataset(5), batch_size=2, max_boxes=4,
                        num_workers=1, shuffle=False, drop_last=False)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b.images.shape[0] == 2  # static shape everywhere
    tail = batches[2]
    assert tail.valid[0].any()            # the real 5th sample
    assert not tail.valid[1].any()        # the pad row
    np.testing.assert_array_equal(tail.images[1], 0.0)
    np.testing.assert_array_equal(tail.labels[1], 0)
    # drop_last=True keeps the old steady-state behavior
    loader2 = DataLoader(_ToyDataset(5), batch_size=2, max_boxes=4,
                         num_workers=1, shuffle=False, drop_last=True)
    assert len(loader2) == 2 and len(list(loader2)) == 2


def test_padded_tail_batch_matches_partial_batch():
    """A padded all-invalid sample contributes exactly zero loss AND zero
    gradient: one train step on [real, pad] produces the same losses and
    the same parameter update as a step on [real] alone — i.e. the padded
    full-size step IS the reference's partial-batch step."""
    import jax

    from refinedet_tpu.train import (create_train_state, make_lr_schedule,
                                     make_optimizer, make_train_step)

    model = build_refinedet("train", 320, 2)
    cfg = TrainConfig(batch_size=2, max_boxes=4, lr=1e-3)
    sched = make_lr_schedule(cfg.lr, cfg.gamma, epoch_size=10,
                             max_epoch=cfg.max_epoch)
    tx = make_optimizer(sched, cfg.momentum, cfg.weight_decay)
    step = make_train_step(model, tx, cfg)

    rng = np.random.RandomState(0)
    img = rng.uniform(-120, 130, (1, 320, 320, 3)).astype(np.float32)
    boxes = np.zeros((1, 4, 4), np.float32)
    boxes[0, 0] = [0.2, 0.2, 0.6, 0.6]
    labels = np.zeros((1, 4), np.int32)
    labels[0, 0] = 1
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True

    def pad(a):
        return np.concatenate([a, np.zeros_like(a)], axis=0)

    s0 = create_train_state(model, jax.random.PRNGKey(0), tx)
    s_pad, m_pad = step(s0, pad(img), pad(boxes), pad(labels), pad(valid))
    s0 = create_train_state(model, jax.random.PRNGKey(0), tx)
    s_real, m_real = step(s0, img, boxes, labels, valid)

    for k in ("loss", "arm_loss_l", "arm_loss_c", "odm_loss_l",
              "odm_loss_c", "num_pos_arm", "num_pos_odm"):
        np.testing.assert_allclose(np.asarray(m_pad[k]),
                                   np.asarray(m_real[k]), rtol=1e-5,
                                   err_msg=k)
    flat_pad = jax.tree_util.tree_leaves(s_pad.params)
    flat_real = jax.tree_util.tree_leaves(s_real.params)
    for a, b in zip(flat_pad, flat_real):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_trainer_epoch_size_is_ceil(tmp_path_factory, tmp_path):
    """Trainer epoch accounting matches the reference's ceil epoch_size:
    5 images / batch 2 -> 3 steps per epoch, 3 log lines."""
    root = str(tmp_path_factory.mktemp("coco5"))
    make_coco_dataset(root, num_images=5, img_size=96)
    dataset = COCODetection(root, [("sarship", "train")],
                            SSDAugmentation(320, (104, 117, 123)))
    cfg = TrainConfig(batch_size=2, max_boxes=8, lr=1e-5, max_epoch=1,
                      num_workers=0)
    lines = []
    trainer = Trainer(build_refinedet("train", 320, 2), dataset, cfg,
                      num_devices=2, log_fn=lines.append)
    assert trainer.epoch_size == 3  # ceil(5/2)
    trainer.train()
    assert len(lines) == 3


def test_trainer_resume_advances_augmentation_stream(tiny_coco, tmp_path):
    """A run resumed at epoch k must continue the (seed, epoch) shuffle/
    augmentation stream from k, not replay epoch 0's draws."""
    dataset = COCODetection(tiny_coco, [("sarship", "train")],
                            SSDAugmentation(320, (104, 117, 123)))
    cfg = TrainConfig(batch_size=2, max_boxes=8, lr=1e-5, max_epoch=5,
                      num_workers=0)
    trainer = Trainer(build_refinedet("train", 320, 2), dataset, cfg,
                      num_devices=2, log_fn=lambda s: None)
    state = trainer.init_state()
    trainer.train(state, start_epoch=3, max_epochs=1)
    # the loader ran exactly one epoch, starting from the resume epoch
    assert dataset.epoch == 3
    assert trainer.loader.epoch == 4


def test_trainer_resume_ema_onoff_mismatch(tiny_coco, tmp_path):
    """Resuming a no-EMA checkpoint with --ema_decay initializes EMA from
    the restored params; resuming an EMA checkpoint without the flag drops
    the EMA state — neither dies in an opaque Orbax tree mismatch
    (round-3 ADVICE item #2)."""
    import jax

    dataset = COCODetection(tiny_coco, [("sarship", "train")],
                            SSDAugmentation(320, (104, 117, 123)))
    model = build_refinedet("train", 320, 2)

    def make_trainer(ema_decay, save):
        cfg = TrainConfig(batch_size=2, max_boxes=8, lr=1e-5, max_epoch=2,
                          num_workers=0, ema_decay=ema_decay)
        return Trainer(model, dataset, cfg, save_folder=save,
                       num_devices=2, log_fn=lambda s: None)

    # off -> on: checkpoint without EMA, resume with --ema_decay
    save = str(tmp_path / "w1")
    t_off = make_trainer(0.0, save)
    state = t_off.init_state()
    assert state.ema_params is None
    t_off.ckpt.save(state, 1)
    t_on = make_trainer(0.999, save)
    resumed = t_on.resume(1)
    assert resumed.ema_params is not None
    for a, b in zip(jax.tree_util.tree_leaves(resumed.ema_params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # on -> off: checkpoint with EMA, resume without the flag
    save2 = str(tmp_path / "w2")
    t_on2 = make_trainer(0.999, save2)
    state2 = t_on2.init_state()
    assert state2.ema_params is not None
    t_on2.ckpt.save(state2, 1)
    t_off2 = make_trainer(0.0, save2)
    resumed2 = t_off2.resume(1)
    assert resumed2.ema_params is None
    for a, b in zip(jax.tree_util.tree_leaves(resumed2.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
