from .state import TrainState, make_optimizer, make_train_state
from .step import Batch, make_train_step, make_eval_step
from .trainer import Trainer

__all__ = [
    "TrainState",
    "make_optimizer",
    "make_train_state",
    "Batch",
    "make_train_step",
    "make_eval_step",
    "Trainer",
]
