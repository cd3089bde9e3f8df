from sudo_rm_rf_tpu.train.augment import (
    normalize_wav,
    online_remix_pairs,
    online_remix_sources,
    fuss_online_augment,
)
from sudo_rm_rf_tpu.train.trainer import (
    TrainState,
    Trainer,
    TrainerConfig,
    stepped_lr_schedule,
)

__all__ = [
    "normalize_wav",
    "online_remix_pairs",
    "online_remix_sources",
    "fuss_online_augment",
    "TrainState",
    "Trainer",
    "TrainerConfig",
    "stepped_lr_schedule",
]
