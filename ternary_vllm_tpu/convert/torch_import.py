"""Checkpoint ingestion: torch / safetensors state dicts → Phi param pytrees.

Capability parity with the reference's cross-framework conversion layer
(reference ``utils/conversion.py:32-241``: per-layer Dense/LayerNorm/Embedding
transfer with transposes, plus ``torch_moondream_to_keras``), re-targeted at
JAX pytrees.  Two naming schemes are understood:

* **HF Phi** (``transformers`` ``PhiForCausalLM``):
  ``model.layers.{i}.self_attn.{q,k,v}_proj`` (fused into Wqkv),
  ``self_attn.dense`` → out_proj, ``model.final_layernorm`` → lm_head.ln.
* **Moondream2 text model** (the reference's checkpoint layout,
  ``convert.py:75-79``): ``text_model.transformer.h.{i}.mixer.Wqkv`` /
  ``mixer.out_proj`` / ``mlp.fc1`` / ``mlp.fc2`` / ``ln``, plus
  ``lm_head.ln`` / ``lm_head.linear`` and ``transformer.embd.wte``.

All Linear weights are transposed from torch's ``(out, in)`` to the
framework's contraction-first ``(in, out)`` (the analogue of the reference's
Dense transpose, ``utils/conversion.py:32-42``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models.phi import PhiConfig


def _np(t):
    """torch tensor / np array → np.float32 array (host)."""
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float().numpy()
    return np.asarray(t, np.float32)


def phi_config_from_hf(hf_config) -> PhiConfig:
    return PhiConfig(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        intermediate_size=hf_config.intermediate_size,
        num_hidden_layers=hf_config.num_hidden_layers,
        num_attention_heads=hf_config.num_attention_heads,
        num_key_value_heads=getattr(hf_config, "num_key_value_heads", None)
        or hf_config.num_attention_heads,
        partial_rotary_factor=getattr(hf_config, "partial_rotary_factor", 0.5),
        rope_theta=getattr(hf_config, "rope_theta", 10000.0),
        layer_norm_eps=getattr(hf_config, "layer_norm_eps", 1e-5),
        max_position_embeddings=hf_config.max_position_embeddings,
        hidden_act=getattr(hf_config, "hidden_act", "gelu_new"),
    )


def _linear(sd, prefix, dtype):
    w = _np(sd[f"{prefix}.weight"]).T  # (out,in) -> (in,out)
    b_key = f"{prefix}.bias"
    b = _np(sd[b_key]) if b_key in sd else np.zeros(w.shape[1], np.float32)
    return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}


def _ln(sd, prefix, dtype):
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"]), dtype),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]), dtype),
    }


def _detect_scheme(keys) -> str:
    for k in keys:
        if ".self_attn.q_proj." in k or k.startswith("model.layers."):
            return "hf"
        if ".mixer.Wqkv." in k or "transformer.h." in k:
            return "moondream"
    raise ValueError("unrecognized checkpoint naming scheme")


def params_from_state_dict(
    sd: Mapping[str, object], config: PhiConfig, dtype=jnp.float32
) -> Dict:
    """Build a dense Phi param pytree from a torch state dict (either scheme)."""
    keys = list(sd.keys())
    # strip a leading "text_model." if present (moondream full-model dict)
    strip = None
    for cand in ("text_model.",):
        if any(k.startswith(cand) for k in keys):
            strip = cand
    if strip:
        sd = {k[len(strip):]: v for k, v in sd.items() if k.startswith(strip)}
        keys = list(sd.keys())
    scheme = _detect_scheme(keys)

    layers = []
    if scheme == "hf":
        for i in range(config.num_hidden_layers):
            p = f"model.layers.{i}"
            q = _linear(sd, f"{p}.self_attn.q_proj", dtype)
            k = _linear(sd, f"{p}.self_attn.k_proj", dtype)
            v = _linear(sd, f"{p}.self_attn.v_proj", dtype)
            wqkv = {
                "w": jnp.concatenate([q["w"], k["w"], v["w"]], axis=1),
                "b": jnp.concatenate([q["b"], k["b"], v["b"]]),
            }
            layers.append(
                {
                    "ln": _ln(sd, f"{p}.input_layernorm", dtype),
                    "wqkv": wqkv,
                    "out_proj": _linear(sd, f"{p}.self_attn.dense", dtype),
                    "fc1": _linear(sd, f"{p}.mlp.fc1", dtype),
                    "fc2": _linear(sd, f"{p}.mlp.fc2", dtype),
                }
            )
        wte = jnp.asarray(_np(sd["model.embed_tokens.weight"]), dtype)
        head = {
            "ln": _ln(sd, "model.final_layernorm", dtype),
            "linear": _linear(sd, "lm_head", dtype),
        }
    else:
        for i in range(config.num_hidden_layers):
            p = f"transformer.h.{i}"
            layers.append(
                {
                    "ln": _ln(sd, f"{p}.ln", dtype),
                    "wqkv": _linear(sd, f"{p}.mixer.Wqkv", dtype),
                    "out_proj": _linear(sd, f"{p}.mixer.out_proj", dtype),
                    "fc1": _linear(sd, f"{p}.mlp.fc1", dtype),
                    "fc2": _linear(sd, f"{p}.mlp.fc2", dtype),
                }
            )
        wte = jnp.asarray(_np(sd["transformer.embd.wte.weight"]), dtype)
        head = {
            "ln": _ln(sd, "lm_head.ln", dtype),
            "linear": _linear(sd, "lm_head.linear", dtype),
        }
    return {"wte": wte, "layers": layers, "lm_head": head}


def vision_params_from_state_dict(sd: Mapping[str, object], config, dtype=jnp.float32) -> Dict:
    """Moondream2 vision tower (SigLIP encoder + projection) → vision pytree.

    Expected torch names (the encoder the reference calls at
    ``train.py:157-159`` / ``test_tflite.py:82-91``):
      ``vision_encoder.encoder.model.visual.patch_embed.linear.{weight,bias}``
      ``...visual.pos_embed``
      ``...visual.blocks.{i}.norm1/attn.qkv/attn.proj/norm2/mlp.fc1/mlp.fc2``
      ``...visual.norm.{weight,bias}``
      ``vision_encoder.projection.mlp.fc1/fc2``
    A leading ``vision_encoder.`` / ``model.`` prefix is stripped if present.
    """
    for prefix in ("vision_encoder.", "model."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    vis = "encoder.model.visual"
    layers = []
    for i in range(config.num_layers):
        p = f"{vis}.blocks.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{p}.norm1", dtype),
                "qkv": _linear(sd, f"{p}.attn.qkv", dtype),
                "proj": _linear(sd, f"{p}.attn.proj", dtype),
                "ln2": _ln(sd, f"{p}.norm2", dtype),
                "fc1": _linear(sd, f"{p}.mlp.fc1", dtype),
                "fc2": _linear(sd, f"{p}.mlp.fc2", dtype),
            }
        )
    pos = _np(sd[f"{vis}.pos_embed"])
    if pos.ndim == 3:
        pos = pos[0]
    return {
        "patch_embed": _linear(sd, f"{vis}.patch_embed.linear", dtype),
        "pos_embed": jnp.asarray(pos, dtype),
        "layers": layers,
        "ln_post": _ln(sd, f"{vis}.norm", dtype),
        "projection": {
            "fc1": _linear(sd, "projection.mlp.fc1", dtype),
            "fc2": _linear(sd, "projection.mlp.fc2", dtype),
        },
    }


def load_safetensors_params(path: str, config: PhiConfig, dtype=jnp.float32) -> Dict:
    """Load from a .safetensors file (the reference reloads checkpoints this
    way, ``convert.py:75-79``)."""
    from safetensors import safe_open  # lazy; baked into the image via torch deps

    sd = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    return params_from_state_dict(sd, config, dtype)
