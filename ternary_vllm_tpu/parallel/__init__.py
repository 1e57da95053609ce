from ternary_vllm_tpu.parallel.mesh import make_mesh
from ternary_vllm_tpu.parallel.sharding import (
    phi_param_specs,
    cache_specs,
    shard_params,
    shard_cache,
)
from ternary_vllm_tpu.parallel.tp import (
    pack_ternary_sharded,
    pack_binary_sharded,
    tp_quantized_matmul_row,
    tp_quantized_matmul_col,
)
from ternary_vllm_tpu.parallel.ring_attention import ring_attention
from ternary_vllm_tpu.parallel.multihost import init_multihost, hybrid_mesh

__all__ = [
    "make_mesh",
    "phi_param_specs",
    "cache_specs",
    "shard_params",
    "shard_cache",
    "pack_ternary_sharded",
    "pack_binary_sharded",
    "tp_quantized_matmul_row",
    "tp_quantized_matmul_col",
    "ring_attention",
    "init_multihost",
    "hybrid_mesh",
]
