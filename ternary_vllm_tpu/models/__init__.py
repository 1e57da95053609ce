from ternary_vllm_tpu.models import phi, phi_tp, vision, vlm
from ternary_vllm_tpu.models.phi import (
    PhiConfig,
    MOONDREAM_PHI_CONFIG,
    TINY_PHI_CONFIG,
    LinearSpec,
    DENSE,
    QUANT_LINEARS,
    layer_specs,
    init_phi_params,
    init_cache,
    embed_tokens,
    lm_head,
    forward,
    forward_tokens,
)

__all__ = [
    "PhiConfig",
    "MOONDREAM_PHI_CONFIG",
    "TINY_PHI_CONFIG",
    "LinearSpec",
    "DENSE",
    "QUANT_LINEARS",
    "layer_specs",
    "init_phi_params",
    "init_cache",
    "embed_tokens",
    "lm_head",
    "forward",
    "forward_tokens",
]
