from refinedet_tpu.train.checkpoints import CheckpointManager
from refinedet_tpu.train.schedule import make_lr_schedule
from refinedet_tpu.train.train_step import (TrainState, create_train_state,
                                            make_optimizer, make_train_step)
from refinedet_tpu.train.trainer import Trainer

__all__ = ["CheckpointManager", "make_lr_schedule", "TrainState",
           "create_train_state", "make_optimizer", "make_train_step",
           "Trainer"]
