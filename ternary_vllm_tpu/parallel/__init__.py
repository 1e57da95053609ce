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
from ternary_vllm_tpu.parallel.pipeline import (
    make_pipe_mesh,
    stack_layer_params,
    unstack_layer_params,
    shard_pipeline_params,
    pipeline_forward,
    pipeline_loss_fn,
)
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
    "make_pipe_mesh",
    "stack_layer_params",
    "unstack_layer_params",
    "shard_pipeline_params",
    "pipeline_forward",
    "pipeline_loss_fn",
    "init_multihost",
    "hybrid_mesh",
]
