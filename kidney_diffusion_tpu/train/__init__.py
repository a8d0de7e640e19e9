from .distill import DistillTrainer
from .trainer import StageState, Trainer

__all__ = ["DistillTrainer", "StageState", "Trainer"]
