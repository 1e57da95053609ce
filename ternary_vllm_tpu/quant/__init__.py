from ternary_vllm_tpu.quant.calibrate import (
    calibrate_binary,
    calibrate_ternary,
    calibrate_linear,
)
from ternary_vllm_tpu.quant.quantize import (
    QuantConfig,
    quantize_decoder_params,
    quantize_linear_int8,
    quantize_lm_head_int8,
    size_report,
)

__all__ = [
    "calibrate_binary",
    "calibrate_ternary",
    "calibrate_linear",
    "QuantConfig",
    "quantize_decoder_params",
    "quantize_linear_int8",
    "quantize_lm_head_int8",
    "size_report",
]
