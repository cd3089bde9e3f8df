"""Offline data preparation utilities.

Numpy/scipy ports of the reference's prep layer (SURVEY.md section 2.6 data
prep): `utils/preprocess_wsj0mix.py`, `utils/create_esc50_hierarchical.py`,
`utils/create_wsj0mix_hier_speakers.py`, driven by `utils/generate_data.sh`.
"""

from sudo_rm_rf_tpu.prep.hierarchical import (
    convert_esc50_to_hierarchical,
    convert_wsj0mix_to_universal,
    make_hierarchical_from_wavs,
    partition_esc50,
    resample_poly,
)

__all__ = [
    "convert_esc50_to_hierarchical",
    "convert_wsj0mix_to_universal",
    "make_hierarchical_from_wavs",
    "partition_esc50",
    "resample_poly",
]
