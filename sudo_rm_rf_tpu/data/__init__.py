"""Host-side dataset pipeline.

Mirrors the reference's loader semantics (SURVEY.md section 2.4) — task
tables, length-metadata caches, zero-pad/crop, random-chunk augmentation —
but numpy-native (no torch), with explicit seeded RNGs instead of the
reference's time-seeded workers, and a threaded prefetching loader that
feeds sharded device batches.
"""

from sudo_rm_rf_tpu.data.base import DatasetConfigError, check_arg
from sudo_rm_rf_tpu.data.loader import DataLoader
from sudo_rm_rf_tpu.data.wham import WhamDataset, WHAM_TASKS
from sudo_rm_rf_tpu.data.whamr import WhamRDataset, WHAMR_TASKS
from sudo_rm_rf_tpu.data.libri2mix import LibriMixDataset
from sudo_rm_rf_tpu.data.fuss import FUSSDataset
from sudo_rm_rf_tpu.data.musdb import MusdbDataset
from sudo_rm_rf_tpu.data.hierarchical import AugmentedOnlineMixingDataset

from sudo_rm_rf_tpu.data.shards import ShardedDataset, pack_dataset, write_shards

__all__ = [
    "DatasetConfigError",
    "check_arg",
    "DataLoader",
    "WhamDataset",
    "WHAM_TASKS",
    "WhamRDataset",
    "WHAMR_TASKS",
    "LibriMixDataset",
    "FUSSDataset",
    "MusdbDataset",
    "AugmentedOnlineMixingDataset",
    "ShardedDataset",
    "pack_dataset",
    "write_shards",
]
