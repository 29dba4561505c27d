"""Learning-rate schedule: linear warmup + stepped decay.

Counterpart of ``adjust_learning_rate`` in
``/root/reference/train_refinedet.py:280-292`` with the surrounding driver
logic (stepvalues at 2/3 and 8/9 of max_epoch, train_refinedet.py:197):
5-epoch linear warmup from 1e-6 to base lr, then gamma^k decay at the two
step boundaries. Expressed as a pure function of the global step so resume
is schedule-consistent by construction (as in the reference, SURVEY.md §5.4).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def make_lr_schedule(base_lr: float, gamma: float, epoch_size: int,
                     max_epoch: int, warmup_epochs: int = 5,
                     warmup_init: float = 1e-6) -> Callable:
    """Return lr(step) as a jit-friendly function of the global iteration."""
    warmup_iters = warmup_epochs * epoch_size
    step_iters = (max_epoch * 2 // 3 * epoch_size,
                  max_epoch * 8 // 9 * epoch_size)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init + (base_lr - warmup_init) * step / warmup_iters
        k = sum(jnp.where(step >= s, 1.0, 0.0) for s in step_iters)
        decayed = base_lr * gamma ** k
        return jnp.where(step < warmup_iters, warm, decayed)

    return schedule
