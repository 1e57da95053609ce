"""ternary_vllm_tpu — TPU-native ternary/binary weight-quantized VLM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
pipeline BenCrulis/ternary-vllm (PyTorch QAT of Moondream2 -> TF/Keras
packed-ternary reimplementation -> TFLite CPU inference):

- ``ops``      bit-packing, STE quantizers, Pallas unpack-matmul kernels
- ``quant``    offline calibration (absmean / iterative-absmean) + model pass
- ``models``   Phi decoder, SigLIP vision encoder, VLM composition (functional,
               pytree params, fixed-shape KV cache)
- ``parallel`` mesh construction + tensor-parallel sharding rules
- ``convert``  torch/safetensors checkpoint ingestion + packed-artifact export
- ``train``    QAT loop (optax), smoothBinary biobjective gradient transform
- ``serve``    decode engine with continuous batching
- ``data``     LLaVA-Instruct/COCO data pipeline
- ``utils``    flags with env override, size accounting, metrics

Reference capability map: see SURVEY.md at the repo root (sections 2 and 7).
"""

__version__ = "0.1.0"
