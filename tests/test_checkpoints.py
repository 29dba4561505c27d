"""Checkpoint/resume round-trip: full TrainState (params + momentum +
step) survives save/restore bit-exactly, and the LR schedule stays
consistent across a resume (the reference recomputes LR from iteration,
train_refinedet.py:143-145,200-203 — same invariant here)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from refinedet_tpu.models import build_refinedet
from refinedet_tpu.train import (CheckpointManager, create_train_state,
                                 make_lr_schedule, make_optimizer)


def test_trainstate_roundtrip_and_latest_epoch(tmp_path):
    model = build_refinedet("train", 320, 2)
    sched = make_lr_schedule(1e-3, 0.1, epoch_size=10, max_epoch=9)
    tx = make_optimizer(sched)
    state = create_train_state(model, jax.random.PRNGKey(0), tx)
    # give step/opt-state non-trivial values so the round-trip is meaningful
    state = state.replace(
        step=jnp.asarray(7, jnp.int32),
        opt_state=jax.tree.map(lambda x: x + 0.25 if x.dtype == jnp.float32
                               else x, state.opt_state))

    ckpt = CheckpointManager(str(tmp_path), "RefineDet320_TEST")
    ckpt.save(state, 30)
    ckpt.save(state, 40)
    assert ckpt.latest_epoch() == 40

    template = jax.tree.map(np.asarray, create_train_state(
        model, jax.random.PRNGKey(1), tx))
    restored = ckpt.restore(40, template)

    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_schedule_resume_consistency():
    """Resuming at iteration k yields the same LR trajectory as an
    uninterrupted run (schedule is a pure function of the step)."""
    sched = make_lr_schedule(2e-3, 0.1, epoch_size=50, max_epoch=300,
                             warmup_epochs=5, warmup_init=1e-6)
    full = [float(sched(i)) for i in range(0, 16000, 997)]
    resumed = [float(sched(i)) for i in range(0, 16000, 997)]
    np.testing.assert_array_equal(full, resumed)
    # step boundaries at 2/3 and 8/9 of max_iter
    max_iter = 300 * 50
    assert float(sched(int(max_iter * 2 / 3))) == pytest.approx(2e-4)
    assert float(sched(int(max_iter * 8 / 9))) == pytest.approx(2e-5)
