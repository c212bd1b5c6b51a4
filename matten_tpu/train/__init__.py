"""Training harness: tasks, trainer loop, schedulers, checkpointing."""

from matten_tpu.train.task import CanonicalRegressionTask, Task
from matten_tpu.train.trainer import Trainer, TrainerConfig

__all__ = ["Task", "CanonicalRegressionTask", "Trainer", "TrainerConfig"]
