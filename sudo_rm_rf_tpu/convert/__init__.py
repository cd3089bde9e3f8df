from sudo_rm_rf_tpu.convert.torch_checkpoint import (
    state_dict_to_params,
    params_to_state_dict,
    torch_key_to_flax_path,
    load_pt_file,
)

__all__ = [
    "state_dict_to_params",
    "params_to_state_dict",
    "torch_key_to_flax_path",
    "load_pt_file",
]
