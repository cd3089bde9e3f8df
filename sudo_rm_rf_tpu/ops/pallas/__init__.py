from sudo_rm_rf_tpu.ops.pallas.uconv import fused_uconv_block, uconv_block_reference

__all__ = ["fused_uconv_block", "uconv_block_reference"]
