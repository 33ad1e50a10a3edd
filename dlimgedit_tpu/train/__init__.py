from .data import prefetch_to_device, sam_batch_iterator
from .step import (
    TrainConfig,
    init_train_state,
    learning_rate_schedule,
    make_train_step,
    mask_loss,
)

__all__ = ["TrainConfig", "init_train_state", "learning_rate_schedule",
           "make_train_step", "mask_loss", "prefetch_to_device",
           "sam_batch_iterator"]
