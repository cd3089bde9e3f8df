from sudo_rm_rf_tpu.losses.sisdr import (
    PermInvariantSISDR,
    StabilizedPermInvSISDRMetric,
    pairwise_neg_sdr,
    pit_from_pair_matrix,
    pit_neg_sdr_loss,
    reorder_sources,
)
from sudo_rm_rf_tpu.losses.snr import PermInvariantSNRwithZeroRefs
from sudo_rm_rf_tpu.losses.norm import perm_invariant_norm
from sudo_rm_rf_tpu.losses.mixture_consistency import mixture_consistency

__all__ = [
    "PermInvariantSISDR",
    "StabilizedPermInvSISDRMetric",
    "pairwise_neg_sdr",
    "pit_from_pair_matrix",
    "pit_neg_sdr_loss",
    "reorder_sources",
    "PermInvariantSNRwithZeroRefs",
    "perm_invariant_norm",
    "mixture_consistency",
]
