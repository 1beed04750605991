"""Training stack: config, optax optimization, jitted steps, train state,
orbax checkpointing, metrics — capability parity with reference
utilities/{config_parser,training_utils,metrics_helper}.py and the driver
loops in train_xla.py."""

from leaf_tpu.training.config import get_config, parse_config
from leaf_tpu.training.optim import ReduceLROnPlateau, optimization_helper
from leaf_tpu.training.state import TrainState
from leaf_tpu.training.steps import (
    bce_logits_loss,
    cross_entropy_loss,
    make_eval_step,
    make_train_multistep,
    make_train_step,
    mixup,
)

__all__ = [
    "get_config",
    "parse_config",
    "optimization_helper",
    "ReduceLROnPlateau",
    "TrainState",
    "make_train_step",
    "make_train_multistep",
    "make_eval_step",
    "mixup",
    "cross_entropy_loss",
    "bce_logits_loss",
]
