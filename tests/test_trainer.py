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
