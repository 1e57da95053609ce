from ternary_vllm_tpu.eval.perplexity import (
    evaluate_loss,
    evaluate_perplexity,
    compare_quantization,
)

__all__ = ["evaluate_loss", "evaluate_perplexity", "compare_quantization"]
