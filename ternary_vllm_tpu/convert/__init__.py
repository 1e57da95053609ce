from ternary_vllm_tpu.convert.torch_import import (
    params_from_state_dict,
    phi_config_from_hf,
    load_safetensors_params,
)

__all__ = [
    "params_from_state_dict",
    "phi_config_from_hf",
    "load_safetensors_params",
]
