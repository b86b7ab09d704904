"""Training: unified data-parallel loop, schedules, checkpointing, eval."""

from pointnet2_tpu.train.schedules import (  # noqa: F401
    bn_momentum_schedule,
    exponential_decay_clipped,
)
from pointnet2_tpu.train.state import TrainState, make_optimizer  # noqa: F401
from pointnet2_tpu.train.steps import make_eval_step, make_train_step  # noqa: F401
from pointnet2_tpu.train.trainer import TrainConfig, Trainer  # noqa: F401
