from ternary_vllm_tpu.serve.decode import Decoder, greedy_generate
from ternary_vllm_tpu.serve.pool import EnginePool
from ternary_vllm_tpu.serve.sampling import sample_token
from ternary_vllm_tpu.serve.speculative import (
    ngram_propose,
    speculative_decode_loop,
    speculative_generate,
)

__all__ = [
    "Decoder",
    "EnginePool",
    "greedy_generate",
    "sample_token",
    "ngram_propose",
    "speculative_decode_loop",
    "speculative_generate",
]
