from mae_clip_tpu.train.metrics import AvgMeter, MetricWriter, Throughput
from mae_clip_tpu.train.optim import (ReduceLROnPlateau, current_lr,
                                      make_optimizer, set_lr_scale)
from mae_clip_tpu.train.state import TrainState
from mae_clip_tpu.train.loop import Trainer, make_eval_step, make_train_step

__all__ = [
    "AvgMeter", "MetricWriter", "Throughput", "ReduceLROnPlateau",
    "current_lr", "make_optimizer", "set_lr_scale", "TrainState",
    "Trainer", "make_eval_step", "make_train_step",
]
