from .config import TrainConfig
from .optim import reference_sgd, poly_lr
from .state import TrainState
from .trainer import Trainer

__all__ = ["TrainConfig", "reference_sgd", "poly_lr", "TrainState", "Trainer"]
