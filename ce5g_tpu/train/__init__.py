from .checkpoint import load_checkpoint, save_checkpoint
from .datasets import ChannelDataset
from .trainer import Trainer, lr_schedule_per_epoch, make_optimizer

__all__ = [
    "load_checkpoint",
    "save_checkpoint",
    "ChannelDataset",
    "Trainer",
    "lr_schedule_per_epoch",
    "make_optimizer",
]
