from .abc import BaseTrainer
from .loader import load_trainer
from .registry import available_trainers, register_trainer, resolve_trainer_class

__all__ = [
    "BaseTrainer",
    "load_trainer",
    "resolve_trainer_class",
    "register_trainer",
    "available_trainers",
]
