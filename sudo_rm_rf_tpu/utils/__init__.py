from sudo_rm_rf_tpu.utils.checkpoint import CheckpointManager
from sudo_rm_rf_tpu.utils.logging import ExperimentLogger, report_losses_mean_and_std
from sudo_rm_rf_tpu.utils.audio_logging import AudioLogger

__all__ = [
    "CheckpointManager",
    "ExperimentLogger",
    "report_losses_mean_and_std",
    "AudioLogger",
]
