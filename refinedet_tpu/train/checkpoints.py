"""Sharding-agnostic checkpointing (Orbax) + PyTorch import path.

Counterpart of the reference's checkpoint story
(``torch.save(net.state_dict())`` every 5-10 epochs,
``/root/reference/train_refinedet.py:227-229,277``; ``module.``-prefix
stripping at load, ``eval_refinedet_coco.py:77-97``), upgraded per
SURVEY.md §5.4: the full TrainState (params + optimizer momentum + step) is
saved, not just weights, so resume keeps SGD momentum; Orbax handles device
placement/sharding on restore.
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Epoch-indexed checkpoints named like the reference's
    ``RefineDet{size}_{dataset}_epoches_{N}`` scheme."""

    def __init__(self, directory: str, prefix: str = "RefineDet320_COCO"):
        self.directory = osp.abspath(directory)
        self.prefix = prefix
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag) -> str:
        return osp.join(self.directory, f"{self.prefix}_epoches_{tag}")

    def save(self, state, epoch) -> str:
        path = self._path(epoch)
        self._ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, epoch, template) -> Any:
        return self._ckptr.restore(self._path(epoch), template)

    def restore_path(self, path: str, template) -> Any:
        return self._ckptr.restore(osp.abspath(path), template)

    def latest_epoch(self) -> Optional[int]:
        pat = re.compile(re.escape(self.prefix) + r"_epoches_(\d+)$")
        epochs = []
        for name in os.listdir(self.directory):
            m = pat.match(name)
            if m:
                epochs.append(int(m.group(1)))
        return max(epochs) if epochs else None
