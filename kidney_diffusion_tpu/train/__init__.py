from .trainer import StageState, Trainer

__all__ = ["StageState", "Trainer"]
