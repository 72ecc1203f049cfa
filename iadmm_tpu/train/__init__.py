from .harness import (train, TrainResult, make_optimizer, make_train_chunk,
                      make_val_fn)
from .early_stopping import EarlyStopping
from .checkpoint import save_checkpoint, load_checkpoint, checkpoint_path

__all__ = ["train", "TrainResult", "make_optimizer", "make_train_chunk",
           "make_val_fn", "EarlyStopping", "save_checkpoint",
           "load_checkpoint", "checkpoint_path"]
