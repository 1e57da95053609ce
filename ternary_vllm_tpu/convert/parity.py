"""Conversion parity reporting: per-block and full-model MSE between a dense
model and its quantized/packed counterpart.

The reference prints per-block MSE during every conversion
(``utils/conversion.py:144-145``) and full-logits MSE (``:236-239``) without
asserting; here the report is a returned structure so callers/tests can gate
on it (SURVEY.md §4: golden parity is the test strategy worth keeping — with
assertions)."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi


def block_mse_report(
    dense_params,
    dense_specs,
    quant_params,
    quant_specs,
    config: phi.PhiConfig,
    input_ids,
) -> Dict:
    """Run both models layer by layer on the same input; report per-block
    hidden-state MSE and final logits MSE."""
    frozen_d = phi.freeze_specs(dense_specs)
    frozen_q = phi.freeze_specs(quant_specs)

    hidden_d, _ = phi.forward(
        dense_params, config, frozen_d, phi.embed_tokens(dense_params, input_ids),
        None, 0, None, return_hidden=True,
    )
    hidden_q, _ = phi.forward(
        quant_params, config, frozen_q, phi.embed_tokens(quant_params, input_ids),
        None, 0, None, return_hidden=True,
    )

    # per-block: replay layer by layer
    x_d = phi.embed_tokens(dense_params, input_ids)
    x_q = phi.embed_tokens(quant_params, input_ids)
    t = input_ids.shape[1]
    positions = jnp.arange(t)
    cos, sin = phi._rope_cos_sin(positions, config.rotary_dim, config.rope_theta, jnp.float32)
    mask = phi._causal_mask_full(t, None, x_d.dtype)
    per_block: List[float] = []
    sd = phi._spec_dicts(frozen_d)
    sq = phi._spec_dicts(frozen_q)
    for pd, pq, s_d, s_q in zip(dense_params["layers"], quant_params["layers"], sd, sq):
        x_d, _ = phi._decoder_layer(pd, s_d, config, x_d, cos, sin, mask, None, 0)
        x_q, _ = phi._decoder_layer(pq, s_q, config, x_q, cos, sin, mask, None, 0)
        per_block.append(float(jnp.mean((x_d - x_q) ** 2)))

    logits_d, _ = phi.forward_tokens(dense_params, config, frozen_d, input_ids)
    logits_q, _ = phi.forward_tokens(quant_params, config, frozen_q, input_ids)
    return {
        "per_block_mse": per_block,
        "final_hidden_mse": float(jnp.mean((hidden_d - hidden_q) ** 2)),
        "logits_mse": float(jnp.mean((logits_d - logits_q) ** 2)),
    }
