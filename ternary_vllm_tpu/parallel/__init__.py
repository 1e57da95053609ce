from ternary_vllm_tpu.parallel.mesh import make_mesh
from ternary_vllm_tpu.parallel.sharding import (
    phi_param_specs,
    cache_specs,
    shard_params,
    shard_cache,
)

__all__ = [
    "make_mesh",
    "phi_param_specs",
    "cache_specs",
    "shard_params",
    "shard_cache",
]
