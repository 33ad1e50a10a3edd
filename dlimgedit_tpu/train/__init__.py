from .birefnet_step import (
    BiRefNetTrainConfig,
    birefnet_loss,
    init_birefnet_train_state,
    make_birefnet_train_step,
    place_birefnet_train_state,
)
from .data import prefetch_to_device, sam_batch_iterator
from .step import (
    TrainConfig,
    init_train_state,
    learning_rate_schedule,
    make_train_step,
    mask_loss,
)

__all__ = ["BiRefNetTrainConfig", "TrainConfig", "birefnet_loss",
           "init_birefnet_train_state", "init_train_state",
           "learning_rate_schedule", "make_birefnet_train_step",
           "make_train_step", "mask_loss", "place_birefnet_train_state",
           "prefetch_to_device", "sam_batch_iterator"]
