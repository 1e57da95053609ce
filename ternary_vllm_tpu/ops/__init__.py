from ternary_vllm_tpu.ops.packing import (
    pack_ternary,
    unpack_ternary,
    pack_binary,
    unpack_binary,
    pack_q4,
    unpack_q4,
    packed_ternary_shape,
    packed_binary_shape,
    packed_q4_shape,
    TERNARY_PLANES,
    BINARY_PLANES,
)
from ternary_vllm_tpu.ops.quantizers import (
    sign_ste,
    step_ste,
    tri_step_ste,
    sign_ste_sat,
    step_ste_sat,
    tri_step_ste_sat,
)
from ternary_vllm_tpu.ops.ternary_matmul import (
    ternary_matmul,
    binary_matmul,
    quantized_matmul,
    dual_ternary_matmul,
    int8_matmul,
    quantize_activations,
)
from ternary_vllm_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_int8,
)
from ternary_vllm_tpu.ops.prefill_attention import prefill_attention

__all__ = [
    "pack_ternary",
    "unpack_ternary",
    "pack_binary",
    "unpack_binary",
    "packed_ternary_shape",
    "packed_binary_shape",
    "TERNARY_PLANES",
    "BINARY_PLANES",
    "sign_ste",
    "step_ste",
    "tri_step_ste",
    "sign_ste_sat",
    "step_ste_sat",
    "tri_step_ste_sat",
    "pack_q4",
    "unpack_q4",
    "packed_q4_shape",
    "ternary_matmul",
    "binary_matmul",
    "quantized_matmul",
    "dual_ternary_matmul",
    "int8_matmul",
    "quantize_activations",
    "decode_attention",
    "decode_attention_int8",
    "prefill_attention",
]
