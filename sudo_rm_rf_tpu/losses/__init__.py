from sudo_rm_rf_tpu.losses.sisdr import (
    PermInvariantSISDR,
    StabilizedPermInvSISDRMetric,
    pairwise_neg_sdr,
    pit_from_pair_matrix,
    pit_neg_sdr_loss,
    reorder_sources,
)
from sudo_rm_rf_tpu.losses.snr import (
    PermInvariantSNRwithZeroRefs,
    SimplerPermInvariantSNRwithZeroRefs,
)
from sudo_rm_rf_tpu.losses.functional import pit_loss, sdr, sdri_loss, sisdr_loss
from sudo_rm_rf_tpu.losses.norm import perm_invariant_norm
from sudo_rm_rf_tpu.losses.mixture_consistency import mixture_consistency
from sudo_rm_rf_tpu.losses.bss_eval import bss_eval_improvement, bss_eval_sources

__all__ = [
    "PermInvariantSISDR",
    "StabilizedPermInvSISDRMetric",
    "pairwise_neg_sdr",
    "pit_from_pair_matrix",
    "pit_neg_sdr_loss",
    "reorder_sources",
    "PermInvariantSNRwithZeroRefs",
    "SimplerPermInvariantSNRwithZeroRefs",
    "pit_loss",
    "sdr",
    "sdri_loss",
    "sisdr_loss",
    "perm_invariant_norm",
    "mixture_consistency",
    "bss_eval_sources",
    "bss_eval_improvement",
]
