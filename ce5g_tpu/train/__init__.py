from .checkpoint import load_checkpoint, save_checkpoint
from .datasets import ChannelDataset
from .trainer import Trainer, advanced_policy, lr_schedule_per_epoch, make_optimizer

__all__ = [
    "load_checkpoint",
    "save_checkpoint",
    "ChannelDataset",
    "Trainer",
    "advanced_policy",
    "lr_schedule_per_epoch",
    "make_optimizer",
]
