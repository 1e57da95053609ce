"""Tracing + roofline analysis utilities.

The reference has no profiling beyond wall-clock prints
(``test_tflite.py:177-219``, SURVEY.md §5); the TPU-native equivalents here:

* :func:`trace` — ``jax.profiler`` trace context (view in Perfetto/XProf);
* :func:`roofline` — measured time vs the HBM/MXU light-speed bound;
* :func:`decode_step_bytes` — analytic HBM-traffic model of one decode step
  of the Phi stack (packed vs dense weights, bf16 vs int8 KV), used to judge
  how close the fused decode loop runs to speed-of-light.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional

from ternary_vllm_tpu.models.phi import PhiConfig

#: per-chip peak numbers (TPU v5e)
HBM_GBPS = {"v5e": 819.0, "v5p": 2765.0, "v4": 1228.0}
BF16_TFLOPS = {"v5e": 197.0, "v5p": 459.0, "v4": 275.0}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """``with trace('/tmp/t'):`` — capture a profiler trace for Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Roofline:
    measured_s: float
    hbm_bound_s: float
    mxu_bound_s: float

    @property
    def bound_s(self) -> float:
        return max(self.hbm_bound_s, self.mxu_bound_s)

    @property
    def sol_fraction(self) -> float:
        """1.0 = running at the light-speed bound."""
        return self.bound_s / self.measured_s if self.measured_s > 0 else 0.0

    @property
    def limiter(self) -> str:
        return "HBM" if self.hbm_bound_s >= self.mxu_bound_s else "MXU"

    def __str__(self):
        return (
            f"measured {self.measured_s*1e3:.3f}ms vs bound {self.bound_s*1e3:.3f}ms "
            f"({self.limiter}-bound) -> {self.sol_fraction*100:.0f}% of speed-of-light"
        )


def roofline(
    bytes_accessed: float,
    flops: float,
    measured_s: float,
    chip: str = "v5e",
) -> Roofline:
    return Roofline(
        measured_s=measured_s,
        hbm_bound_s=bytes_accessed / (HBM_GBPS[chip] * 1e9),
        mxu_bound_s=flops / (BF16_TFLOPS[chip] * 1e12),
    )


def decode_step_bytes(
    config: PhiConfig,
    batch: int = 1,
    cache_len: int = 1024,
    weights: str = "ternary",  # ternary | binary | bf16 | int8
    kv_dtype: str = "bf16",  # bf16 | int8 | f32
    quantize_lm_head: bool = False,
) -> dict:
    """Analytic HBM bytes read per decode step (weights + KV cache + lm_head).

    Weight streaming dominates batch-1 decode; activations are negligible."""
    d, f, v = config.hidden_size, config.intermediate_size, config.vocab_size
    layer_params = d * config.qkv_dim + d * d + d * f + f * d
    wbits = {"ternary": 2, "binary": 1, "bf16": 16, "int8": 8}[weights]
    layer_bytes = layer_params * wbits / 8
    decoder_bytes = layer_bytes * config.num_hidden_layers

    lm_params = d * v
    lm_bytes = lm_params * ((2 if weights == "ternary" else wbits) / 8 if quantize_lm_head else 2)

    kv_bytes_per_el = {"bf16": 2, "f32": 4, "int8": 1.25}[kv_dtype]  # int8 incl. scales
    kv_bytes = (
        2 * batch * config.num_key_value_heads * cache_len * config.head_dim * kv_bytes_per_el
        * config.num_hidden_layers
    )

    total = decoder_bytes + lm_bytes + kv_bytes
    return {
        "decoder_weight_bytes": decoder_bytes,
        "lm_head_bytes": lm_bytes,
        "kv_cache_bytes": kv_bytes,
        "total_bytes": total,
    }


def decode_step_flops(config: PhiConfig, batch: int = 1, cache_len: int = 1024) -> float:
    d, f, v = config.hidden_size, config.intermediate_size, config.vocab_size
    layer = 2 * batch * (d * config.qkv_dim + d * d + d * f + f * d)
    attn = 2 * batch * config.num_attention_heads * cache_len * config.head_dim * 2
    return (layer + attn) * config.num_hidden_layers + 2 * batch * d * v
