"""Training harness: Trainer, callbacks, loggers, checkpoints."""
from msla_tpu.train.callbacks import Callback, EarlyStopping, ModelCheckpoint
from msla_tpu.train.checkpoint import load_checkpoint, restore_params, save_checkpoint
from msla_tpu.train.loggers import CSVLogger, Logger, TensorBoardLogger, WandbLogger
from msla_tpu.train.trainer import Trainer, TrainState

__all__ = ["CSVLogger", "Callback", "EarlyStopping", "Logger", "ModelCheckpoint",
           "TensorBoardLogger", "TrainState", "Trainer", "WandbLogger",
           "load_checkpoint", "restore_params", "save_checkpoint"]
