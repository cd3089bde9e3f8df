from sudo_rm_rf_tpu.inference.overlap_add import OverlapAddSeparator, separate_file
from sudo_rm_rf_tpu.inference.sequence_parallel import (
    SequenceParallelSeparator,
    causal_forward_seq,
    groupcomm_forward_seq,
    improved_forward_seq,
    make_seq_mesh,
)

__all__ = [
    "OverlapAddSeparator",
    "SequenceParallelSeparator",
    "causal_forward_seq",
    "groupcomm_forward_seq",
    "improved_forward_seq",
    "make_seq_mesh",
    "separate_file",
]
