from ternary_vllm_tpu.serve.decode import Decoder, greedy_generate
from ternary_vllm_tpu.serve.sampling import sample_token

__all__ = ["Decoder", "greedy_generate", "sample_token"]
