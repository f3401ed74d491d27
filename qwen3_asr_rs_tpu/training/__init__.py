from .checkpoint import (
    AsyncTrainCheckpointer,
    restore_train_state,
    save_train_state,
)
from .data import AsrDataset, Utterance, prefetch_to_device, read_manifest
from .train_step import TrainState, asr_loss, make_train_step

__all__ = [
    "AsrDataset",
    "AsyncTrainCheckpointer",
    "TrainState",
    "Utterance",
    "asr_loss",
    "make_train_step",
    "prefetch_to_device",
    "read_manifest",
    "restore_train_state",
    "save_train_state",
]
