from exploremultimodal_tpu.train.optim import (
    build_schedule,
    create_optimizer,
    lr_multipliers,
    no_decay_mask,
)
from exploremultimodal_tpu.train.state import TrainState, create_train_state
from exploremultimodal_tpu.train.trainer import Trainer

__all__ = [
    "TrainState",
    "Trainer",
    "build_schedule",
    "create_optimizer",
    "create_train_state",
    "lr_multipliers",
    "no_decay_mask",
]
