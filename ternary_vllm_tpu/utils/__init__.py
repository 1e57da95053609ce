from ternary_vllm_tpu.utils.scripting import get_var, make_parser_value
from ternary_vllm_tpu.utils.metrics import MetricLogger

__all__ = ["get_var", "make_parser_value", "MetricLogger"]
