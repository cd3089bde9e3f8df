from sudo_rm_rf_tpu.inference.overlap_add import OverlapAddSeparator, separate_file

__all__ = ["OverlapAddSeparator", "separate_file"]
