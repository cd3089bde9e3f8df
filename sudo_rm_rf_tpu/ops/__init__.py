"""Low-level numerical ops with PyTorch-compatible semantics.

Every op here is pure, jittable, and shape-static. Semantics are pinned to
the reference implementation (cited per-op) and verified by golden tests in
tests/test_ops.py against torch on random inputs.
"""

from sudo_rm_rf_tpu.ops.conv import conv1d, conv_transpose1d
from sudo_rm_rf_tpu.ops.frame import overlap_and_add
from sudo_rm_rf_tpu.ops.norm import glob_ln
from sudo_rm_rf_tpu.ops.pad import pad_to_multiple, unpad_to_length
from sudo_rm_rf_tpu.ops.resample import upsample_nearest_2x

__all__ = [
    "conv1d",
    "conv_transpose1d",
    "glob_ln",
    "overlap_and_add",
    "pad_to_multiple",
    "unpad_to_length",
    "upsample_nearest_2x",
]
