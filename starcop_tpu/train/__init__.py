"""Training: jitted data-parallel step, schedules, early stopping, checkpoints."""

from starcop_tpu.train.loop import (  # noqa: F401
    EarlyStopping,
    ReduceLROnPlateau,
    Trainer,
    TrainState,
    create_train_state,
)
from starcop_tpu.train.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
