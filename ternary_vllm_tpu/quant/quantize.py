"""Model-level quantization passes over Phi param pytrees.

Parity with the reference's ``quantize_moondream`` (reference
``binary/utils.py:7-77``): walk the decoder, replace the quantizable Linears
(Wqkv / out_proj / fc1 / fc2) with calibrated quantized params, skip the
``lm_head`` plus the first ``start_skip`` / last ``last_skip`` decoder blocks,
optionally remove blocks entirely, and report the parameter/bit-size
accounting (1 bit binary, 2 bits ternary, 16 bits everything else,
``binary/utils.py:41-57``).

Here the pass is a pure pytree→pytree function returning (params, specs):
* ``quantize_decoder_params``: dense → **qat** params (latent + scale) via
  offline calibration — the training-side representation.
* ``pack_decoder_params``: qat → **packed** params (uint8 + scale) — the
  inference-side representation consumed by the Pallas kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp

from ternary_vllm_tpu.models.phi import (
    QUANT_LINEARS,
    DENSE,
    LinearSpec,
    PhiConfig,
)
from ternary_vllm_tpu.ops.packing import pack_binary, pack_q4, pack_ternary
from ternary_vllm_tpu.ops.quantizers import QUANTIZERS
from ternary_vllm_tpu.quant.calibrate import calibrate_linear


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Mirrors the reference's quantization flags (``train.py:22-46``,
    ``binary/utils.py:7-27``)."""

    quantization: str = "ternary"  # ternary | binary | binary01 | smoothBinary
    neuron_scale: Optional[str] = None  # uniform | independent (None = mode default)
    scaling: Union[str, float, None] = "none"  # none | float | std | natural
    kmeans_iter: int = 10
    start_skip: int = 0
    last_skip: int = 0
    max_val: float = 100.0
    remove_blocks: Sequence[int] = ()


def _quantize_linear_params(p, qc: QuantConfig):
    latent, scale = calibrate_linear(
        p["w"],
        mode=qc.quantization,
        neuron_scale=qc.neuron_scale,
        scaling=qc.scaling,
        kmeans_iter=qc.kmeans_iter,
    )
    return {"latent": latent, "scale": scale, "b": jnp.asarray(p["b"], jnp.float32)}


def quantize_decoder_params(params, config: PhiConfig, qc: QuantConfig):
    """Dense params → (qat params, specs).  Blocks in ``qc.remove_blocks`` are
    dropped (reference ``binary/utils.py:29-34``); the caller must shrink
    ``config.num_hidden_layers`` accordingly."""
    layers = [l for i, l in enumerate(params["layers"]) if i not in set(qc.remove_blocks)]
    n = len(layers)
    qat_spec = LinearSpec(kind="qat", mode=qc.quantization, clip_val=qc.max_val)
    new_layers, specs = [], []
    for i, layer in enumerate(layers):
        quantize = qc.start_skip <= i < n - qc.last_skip
        new_layer = {"ln": layer["ln"]}
        spec = {}
        for name in QUANT_LINEARS:
            if quantize:
                new_layer[name] = _quantize_linear_params(layer[name], qc)
                spec[name] = qat_spec
            else:
                new_layer[name] = layer[name]
                spec[name] = DENSE
        new_layers.append(new_layer)
        specs.append(spec)
    out = dict(params)
    out["layers"] = new_layers
    return out, tuple(specs)


def quantize_linear_int8(p):
    """Dense linear params ``{"w", "b"}`` → w8 params ``{"w_q", "scale", "b"}``
    (per-output-channel symmetric absmax int8).  Used for the lm_head, which
    the reference never quantizes (``binary/utils.py:14``) but whose bf16
    vocab projection dominates the decode step's fixed cost on TPU."""
    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {"w_q": w_q, "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_lm_head_int8(params):
    """Return params with the lm_head linear converted to int8 (w8a8 path)."""
    out = dict(params)
    lm = dict(params["lm_head"])
    lm["linear"] = quantize_linear_int8(params["lm_head"]["linear"])
    out["lm_head"] = lm
    return out


def quantize_linear_int4(p):
    """Dense linear params ``{"w", "b"}`` → w4 params ``{"w_q4p", "scale", "b"}``
    (per-output-channel symmetric absmax int4, planar-packed 2/byte — see
    ``ops.packing.pack_int4_planar``).  Halves the lm_head's HBM bytes vs
    int8; accuracy cost is larger (4-bit vocab projection), so this is the
    opt-in throughput format — gate with ``eval.perplexity``."""
    from ternary_vllm_tpu.ops.packing import pack_int4_planar

    w = p["w"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    w_q = jnp.clip(jnp.round(w / scale[None, :]), -7, 7)
    out = {"w_q4p": pack_int4_planar(w_q), "scale": scale.astype(jnp.float32)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_lm_head_int4(params):
    """Return params with the lm_head linear converted to int4 (w4a8 path)."""
    out = dict(params)
    lm = dict(params["lm_head"])
    lm["linear"] = quantize_linear_int4(params["lm_head"]["linear"])
    out["lm_head"] = lm
    return out


def pack_decoder_params(params, specs, k_multiple: int = 512, fmt: str = "q2", a8: bool = False):
    """QAT params → (packed params, packed specs) for inference.

    Latent weights are hard-quantized with the spec's STE forward (sign /
    tri-step — same thresholds as the reference's conversion, which ternarizes
    with SteTern(0.5) before packing, ``utils/conversion.py:44-93``) and
    bit-packed with K padded to ``k_multiple`` so S stays lane-aligned for the
    Pallas kernel.  ``fmt="q4"`` (ternary only) selects the nibble-int4
    throughput format (see ``ops/packing.py``).  ``a8=True`` marks the specs
    for the int8-activation (w2a8) kernel — fastest decode path (q2 only)."""
    new_layers, new_specs = [], []
    for layer, spec in zip(params["layers"], specs):
        new_layer = {"ln": layer["ln"]}
        new_spec = {}
        for name in QUANT_LINEARS:
            s = spec[name]
            p = layer[name]
            if s.kind == "qat":
                if s.mode == "smoothBinary":
                    w = jnp.sign(p["latent"])  # eval-time hard sign (modules.py:139-146)
                    scale = jnp.ones((p["latent"].shape[1],), jnp.float32)
                else:
                    w = QUANTIZERS[s.mode](p["latent"])
                    scale = p["scale"]
                k = w.shape[0]
                kp = ((k + k_multiple - 1) // k_multiple) * k_multiple
                if kp != k:
                    pad_val = 0.0 if s.mode == "ternary" else -1.0
                    w = jnp.concatenate(
                        [w, jnp.full((kp - k, w.shape[1]), pad_val, w.dtype)], axis=0
                    )
                use_fmt = fmt if s.mode == "ternary" else "q2"
                if use_fmt == "q4":
                    packed = pack_q4(w)
                elif s.mode == "ternary":
                    packed = pack_ternary(w)
                else:
                    packed = pack_binary(w, zero_one=(s.mode == "binary01"))
                new_layer[name] = {"packed": packed, "scale": scale, "b": p["b"]}
                new_spec[name] = LinearSpec(
                    kind="packed", mode=s.mode, clip_val=s.clip_val, fmt=use_fmt,
                    a8=a8 and use_fmt == "q2",
                )
            else:
                new_layer[name] = p
                new_spec[name] = s
        new_layers.append(new_layer)
        new_specs.append(new_spec)
    out = dict(params)
    out["layers"] = new_layers
    return cast_serving_constants(out), tuple(new_specs)


def fuse_packed_decoder_params(params, specs):
    """Fuse each fully-packed ternary-q2 layer's four matmuls into two:

    * ``in_proj``  = [Wqkv | fc1] concatenated along output columns (shared
      input ln(x); gelu applied to the fc1 half via the kernel's act_split);
    * ``out2``     = [out_proj ; fc2] packed blocks stacked along S for the
      dual-accumulator kernel (their outputs are summed by the parallel
      residual block anyway, reference ``layers.py:347``).

    Layers that aren't uniformly packed/q2 with one mode pass through
    unchanged.  Binary modes fuse on the a8 (w1a8) kernels only — the
    bf16-activation dual kernel is ternary-specific.
    Numerics are exact (per-matrix scale/bias/clip preserved)."""
    new_layers, new_specs = [], []
    for layer, spec in zip(params["layers"], specs):
        fusable = (
            all(
                name in spec
                and spec[name].kind == "packed"
                and spec[name].fmt == "q2"
                for name in QUANT_LINEARS
            )
            and len({spec[n].clip_val for n in QUANT_LINEARS}) == 1
            and len({spec[n].mode for n in QUANT_LINEARS}) == 1
            and (
                spec[QUANT_LINEARS[0]].mode == "ternary"
                or all(spec[n].a8 for n in QUANT_LINEARS)
            )
        )
        if not fusable:
            new_layers.append(layer)
            new_specs.append(spec)
            continue
        wqkv, fc1 = layer["wqkv"], layer["fc1"]
        out_p, fc2 = layer["out_proj"], layer["fc2"]
        clip = spec["wqkv"].clip_val
        new_layers.append(
            {
                "ln": layer["ln"],
                "in_proj": {
                    "packed": jnp.concatenate([wqkv["packed"], fc1["packed"]], axis=1),
                    "scale": jnp.concatenate([wqkv["scale"], fc1["scale"]]),
                    "b": jnp.concatenate([wqkv["b"], fc1["b"]]),
                },
                "out2": {
                    "packed": jnp.concatenate([out_p["packed"], fc2["packed"]], axis=0),
                    "scale1": out_p["scale"],
                    "b1": out_p["b"],
                    "scale2": fc2["scale"],
                    "b2": fc2["b"],
                },
            }
        )
        a8_all = all(spec[n].a8 for n in QUANT_LINEARS)
        fused_spec = LinearSpec(
            kind="packed", mode=spec[QUANT_LINEARS[0]].mode, clip_val=clip, a8=a8_all
        )
        # Record the out_proj/fc2 split point: pack_decoder_params pads K to
        # k_multiple (default 512) BEFORE packing, so the split cannot be
        # recomputed from the logical hidden size alone (unfuse would
        # misalign for any config whose hidden/intermediate size is not a
        # k_multiple multiple).
        out2_spec = dataclasses.replace(fused_spec, rows1=int(out_p["packed"].shape[0]))
        new_specs.append({"in_proj": fused_spec, "out2": out2_spec})
    out = dict(params)
    out["layers"] = new_layers
    return cast_serving_constants(out), tuple(new_specs)


def _unpack_w(packed, spec: LinearSpec, k: int, dtype):
    """Packed uint8 planes → dequantized codes (k, N) in ``dtype``."""
    from ternary_vllm_tpu.ops.packing import unpack_binary, unpack_q4, unpack_ternary

    if spec.fmt == "q4":
        return unpack_q4(packed, k, dtype)
    mode = "binary" if spec.mode == "smoothBinary" else spec.mode
    if mode == "ternary":
        return unpack_ternary(packed, k, dtype)
    return unpack_binary(packed, k, zero_one=(mode == "binary01"), dtype=dtype)


def _packed_rows(spec: LinearSpec, k: int) -> int:
    """Rows the (possibly fused) packed array devotes to a logical K of ``k``."""
    from ternary_vllm_tpu.ops.packing import packed_binary_shape, packed_q4_shape, packed_ternary_shape

    if spec.fmt == "q4":
        return packed_q4_shape(k, 1)[0]
    mode = "binary" if spec.mode == "smoothBinary" else spec.mode
    if mode == "ternary":
        return packed_ternary_shape(k, 1)[0]
    return packed_binary_shape(k, 1)[0]


def _out2_rows1(s_o2: LinearSpec, o2_packed, d: int, f: int) -> int:
    """Split point of a fused out2 packed block ([out_proj ; fc2] along S).

    Prefers the ``rows1`` recorded at fuse time (exact even when
    pack_decoder_params padded K to k_multiple).  Legacy specs without it can
    only be split when no k_multiple padding happened — validated against the
    total packed rows, with a clear error otherwise."""
    if s_o2.rows1 is not None:
        return s_o2.rows1
    rows1 = _packed_rows(s_o2, d)
    expect = rows1 + _packed_rows(s_o2, f)
    if o2_packed.shape[0] != expect:
        raise ValueError(
            f"fused out2 packed block has {o2_packed.shape[0]} rows but the "
            f"unpadded split expects {expect} (d={d}, f={f}): the weights were "
            "packed with k_multiple padding and the spec predates "
            "LinearSpec.rows1 — re-fuse with fuse_packed_decoder_params to "
            "record the split point."
        )
    return rows1


_F32_CONST_KEYS = ("scale", "scale1", "scale2", "b", "b1", "b2")


def _cast_ln_f32(ln):
    return {k: v.astype(jnp.float32) for k, v in ln.items()}


def cast_serving_constants(params):
    """Pre-cast per-channel scale/bias/LN constants of quantized Linears to f32.

    Every quantized-matmul wrapper casts these operands to f32 per call
    (e.g. ``bias.reshape(1, n).astype(f32)`` in ``ops.ternary_matmul``), and
    XLA does NOT hoist the converts out of a jitted decode ``while_loop``:
    the 7B in-loop trace shows 163 ``convert`` ops costing ~64 us/step
    (DESIGN.md §6 round-5).  Casting once at load time makes those converts
    no-ops with bit-identical numerics — bf16→f32 is exact and every consumer
    (Pallas kernels, XLA fallbacks, ``phi._layer_norm``) already computes
    these terms in f32.  Only applied to quantized param dicts (``packed`` /
    ``w_q``) and LN dicts; dense ``{"w", "b"}`` Linears keep their dtype (the
    dense branch adds ``b`` in the activation dtype).
    """
    def cast_linear(p):
        if not isinstance(p, dict) or not ("packed" in p or "w_q" in p):
            return p
        return {
            k: (v.astype(jnp.float32) if k in _F32_CONST_KEYS else v)
            for k, v in p.items()
        }

    out = dict(params)
    out["layers"] = [
        {
            name: (_cast_ln_f32(sub) if name == "ln" else cast_linear(sub))
            for name, sub in layer.items()
        }
        for layer in params["layers"]
    ]
    if isinstance(params.get("lm_head"), dict):
        head = dict(params["lm_head"])
        if isinstance(head.get("ln"), dict):
            head["ln"] = _cast_ln_f32(head["ln"])
        if isinstance(head.get("linear"), dict):
            head["linear"] = cast_linear(head["linear"])
        out["lm_head"] = head
    return out


def unfuse_packed_decoder_params(params, specs, config: Optional[PhiConfig] = None):
    """Inverse of :func:`fuse_packed_decoder_params`: split each fused layer's
    ``in_proj``/``out2`` packed blocks back into the four unfused packed
    Linears (pure slicing of the planes — numerics identical).

    Lets sequence-parallel ring prefill (``parallel/sp_prefill.py``, which
    needs per-matmul access to Wqkv for attention) consume the SAME fused
    packed params the single-chip flagship serves (round-3 VERDICT item 4),
    relayouting at the prefill boundary instead of requiring callers to keep
    a second unfused copy."""
    cfg = config if config is not None else PhiConfig()
    d, f, qkvd = cfg.hidden_size, cfg.intermediate_size, cfg.qkv_dim
    new_layers, new_specs = [], []
    for layer, spec in zip(params["layers"], specs):
        if "in_proj" not in spec:
            new_layers.append(layer)
            new_specs.append(spec)
            continue
        s_in, s_o2 = spec["in_proj"], spec["out2"]
        ip, o2 = layer["in_proj"], layer["out2"]
        rows1 = _out2_rows1(s_o2, o2["packed"], d, f)
        new_layers.append(
            {
                "ln": layer["ln"],
                "wqkv": {
                    "packed": ip["packed"][:, :qkvd],
                    "scale": ip["scale"][:qkvd],
                    "b": ip["b"][:qkvd],
                },
                "fc1": {
                    "packed": ip["packed"][:, qkvd:],
                    "scale": ip["scale"][qkvd:],
                    "b": ip["b"][qkvd:],
                },
                "out_proj": {
                    "packed": o2["packed"][:rows1],
                    "scale": o2["scale1"],
                    "b": o2["b1"],
                },
                "fc2": {
                    "packed": o2["packed"][rows1:],
                    "scale": o2["scale2"],
                    "b": o2["b2"],
                },
            }
        )
        unfused = dataclasses.replace(s_in, fmt="q2")
        new_specs.append({n: unfused for n in QUANT_LINEARS})
    out = dict(params)
    out["layers"] = new_layers
    return out, tuple(new_specs)


def unpack_decoder_params(params, specs, config: Optional[PhiConfig] = None, dtype=jnp.bfloat16):
    """Packed (fused or unfused) params → unfused DENSE params for prefill.

    The prefill A/B (``bench_prefill.py``; round-3 VERDICT item 2) shows the
    packed kernels lose at compute-bound prefill shapes (M = chunk), exactly
    as the ViT study predicted (BENCHMARKS.md) — at M ≥ ~256 the MXU wants
    plain bf16 matmuls.  This pass dequantizes each packed Linear ONCE at
    engine build (``w = codes * scale``, column-wise) so chunked admission can
    run dense while decode keeps the packed kernels on the same logical
    weights.  Numerics match the packed path up to bf16 rounding: the dense
    spec carries the packed spec's ``clip_val`` (honored by
    ``phi.apply_linear``'s dense branch); only a8's activation-int8 rounding
    is absent (it exists for kernel throughput, not accuracy).

    HBM cost: a full bf16 copy of the decoder linears (e.g. ~2.4 GB for the
    1.4B flagship) — callers gate on capacity (``Engine`` does).
    """
    cfg = config if config is not None else PhiConfig()
    d, f = cfg.hidden_size, cfg.intermediate_size
    kdims = {"wqkv": d, "out_proj": d, "fc1": d, "fc2": f}
    new_layers, new_specs = [], []
    for layer, spec in zip(params["layers"], specs):
        new_layer = {"ln": layer["ln"]}
        new_spec = {}
        if "in_proj" in spec:  # fused flagship layout -> split back to 4 Linears
            s_in, s_o2 = spec["in_proj"], spec["out2"]
            ip, o2 = layer["in_proj"], layer["out2"]
            both = _unpack_w(ip["packed"], s_in, d, jnp.float32)
            scale = ip["scale"].astype(jnp.float32)
            wfull = both * scale[None, :]
            bias = ip["b"]
            rows1 = _out2_rows1(s_o2, o2["packed"], d, f)
            w_out = _unpack_w(o2["packed"][:rows1], s_o2, d, jnp.float32)
            w_fc2 = _unpack_w(o2["packed"][rows1:], s_o2, f, jnp.float32)
            qkvd = cfg.qkv_dim
            parts = {
                "wqkv": (wfull[:, :qkvd].astype(dtype), bias[:qkvd]),
                "fc1": (wfull[:, qkvd:].astype(dtype), bias[qkvd:]),
                "out_proj": ((w_out * o2["scale1"].astype(jnp.float32)[None, :]).astype(dtype), o2["b1"]),
                "fc2": ((w_fc2 * o2["scale2"].astype(jnp.float32)[None, :]).astype(dtype), o2["b2"]),
            }
            clip = s_in.clip_val
            for name, (w, b) in parts.items():
                new_layer[name] = {"w": w, "b": b.astype(dtype)}
                new_spec[name] = LinearSpec(kind="dense", clip_val=clip)
        else:
            for name in QUANT_LINEARS:
                s, p = spec[name], layer[name]
                if s.kind != "packed":
                    new_layer[name] = p
                    new_spec[name] = s
                    continue
                w = _unpack_w(p["packed"], s, kdims[name], jnp.float32)
                w = (w * p["scale"].astype(jnp.float32)[None, :]).astype(dtype)
                new_layer[name] = {"w": w, "b": p["b"].astype(dtype)}
                new_spec[name] = LinearSpec(kind="dense", clip_val=s.clip_val)
        new_layers.append(new_layer)
        new_specs.append(new_spec)
    out = dict(params)
    out["layers"] = new_layers
    return out, tuple(new_specs)


def size_report(params, specs) -> dict:
    """Bit-size accounting (reference ``binary/utils.py:41-71``): quantized
    params at 1 (binary) / 2 (ternary) bits, everything else at 16."""
    import jax

    bits_q = 0
    n_q = 0
    n_other = 0
    q_paths = set()
    for li, spec in enumerate(specs):
        for name, s in spec.items():
            if s.kind in ("qat", "packed"):
                q_paths.add((li, name))
    for li, layer in enumerate(params["layers"]):
        for name, p in layer.items():
            if name == "ln":
                n_other += sum(int(v.size) for v in p.values())
                continue
            if (li, name) in q_paths:
                spec = specs[li][name]
                fmt = getattr(spec, "fmt", "q2")
                if "latent" in p:
                    nw = int(p["latent"].size)
                else:
                    planes = 2 if fmt == "q4" else (4 if spec.mode == "ternary" else 8)
                    nw = int(p["packed"].size) * planes
                if fmt == "q4":
                    bits = 4
                else:
                    bits = 2 if spec.mode == "ternary" else 1
                bits_q += nw * bits
                n_q += nw
                n_other += sum(
                    int(v.size) for key, v in p.items() if key not in ("latent", "packed", "w")
                )
            else:
                n_other += sum(int(jnp.asarray(v).size) for v in jax.tree_util.tree_leaves(p))
    n_int8 = 0
    n_int4 = 0
    for key in ("wte", "lm_head"):
        if key in params:
            for v in jax.tree_util.tree_leaves(params[key]):
                if v.dtype == jnp.int8:  # int8-quantized lm_head (w8a8)
                    n_int8 += int(v.size)
                elif v.dtype == jnp.uint8:  # planar-int4 lm_head (w4a8): 2/byte
                    n_int4 += 2 * int(v.size)
                else:
                    n_other += int(v.size)
    total_bits = bits_q + n_other * 16 + n_int8 * 8 + n_int4 * 4
    return {
        "quantized_params": n_q,
        "int8_params": n_int8,
        "int4_params": n_int4,
        "other_params": n_other,
        "quantized_bits": bits_q,
        "total_gib": total_bits / 8 / 2**30,
        "fp16_gib": (n_q + n_other + n_int8 + n_int4) * 2 / 2**30,
    }
