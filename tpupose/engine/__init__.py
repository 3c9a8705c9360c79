from tpupose.engine.optimizers import make_optimizer, OPTIMIZERS
from tpupose.engine.schedulers import make_schedule, SCHEDULERS
from tpupose.engine.train_state import TrainState, create_train_state
from tpupose.engine.checkpoint import CheckpointManager
from tpupose.engine.builder import Builder
from tpupose.engine.trainer import Trainer

__all__ = [
    "make_optimizer", "OPTIMIZERS", "make_schedule", "SCHEDULERS",
    "TrainState", "create_train_state", "CheckpointManager",
    "Builder", "Trainer",
]
