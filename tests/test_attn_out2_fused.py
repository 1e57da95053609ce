"""Wiring tests for ops/attn_out2_fused (the merged attention+out2 decode
kernel).  The Pallas kernel itself is TPU-only (validated bit-exact against
the composed pair on hardware by ``examples/check_attn_out2_fused.py``);
these tests pin the CPU-visible contract: the wrapper's fallback composition
matches the hand-composed pair, and the phi decode layer produces identical
results with the fusion flag on and off (off-TPU both routes compose)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.ops.attn_out2_fused import _pick_bs, attn_dual_decode
from ternary_vllm_tpu.ops.fused_decode_attention import fused_decode_attention
from ternary_vllm_tpu.ops.packing import pack_ternary
from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul
from ternary_vllm_tpu.quant.quantize import fuse_packed_decoder_params


def _mk_case(seed=0, h=4, hd=64, kvh=4, cap=256, f=512):
    d = h * hd
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    q = (jax.random.normal(ks[0], (1, h, hd)) * 0.3).astype(jnp.bfloat16)
    kn = (jax.random.normal(ks[1], (1, kvh, hd)) * 0.3).astype(jnp.bfloat16)
    vn = (jax.random.normal(ks[2], (1, kvh, hd)) * 0.3).astype(jnp.bfloat16)
    rd = hd // 2
    cos = jnp.cos(jax.random.normal(ks[3], (1, rd))).astype(jnp.float32)
    sin = jnp.sin(jax.random.normal(ks[4], (1, rd))).astype(jnp.float32)
    kc = (jax.random.normal(ks[5], (1, kvh, cap, hd)) * 0.3).astype(jnp.bfloat16)
    vc = (jax.random.normal(ks[6], (1, kvh, cap, hd)) * 0.3).astype(jnp.bfloat16)
    x2 = (jax.random.normal(ks[7], (1, f)) * 0.5).astype(jnp.bfloat16)
    res = (jax.random.normal(ks[8], (1, d)) * 0.5).astype(jnp.bfloat16)
    packed = jnp.concatenate(
        [pack_ternary(jax.random.normal(ks[9], (d, d))),
         pack_ternary(jax.random.normal(ks[10], (f, d)))], axis=0
    )
    return dict(q=q, kn=kn, vn=vn, cos=cos, sin=sin, kc=kc, vc=vc, x2=x2,
                res=res, packed=packed, s1=d // 4, d=d, rd=rd,
                sc1=jnp.full((d,), 0.02, jnp.float32),
                sc2=jnp.full((d,), 0.03, jnp.float32),
                b1=jnp.zeros((d,), jnp.float32),
                b2=jnp.full((d,), 0.1, jnp.float32))


def test_fallback_matches_composed_pair():
    a = _mk_case()
    pos = jnp.int32(37)
    out_m, kc_m, vc_m = attn_dual_decode(
        a["q"], a["kn"], a["vn"], a["cos"], a["sin"], a["kc"] + 0, a["vc"] + 0,
        pos, a["x2"], a["packed"], a["s1"], a["sc1"], a["b1"], a["sc2"],
        a["b2"], a["res"], rotary_dim=a["rd"], clip_val=100.0, mode="ternary",
    )
    attn, kc_r, vc_r = fused_decode_attention(
        a["q"], a["kn"], a["vn"], a["cos"], a["sin"], a["kc"] + 0, a["vc"] + 0,
        pos, rotary_dim=a["rd"],
    )
    out_r = dual_ternary_matmul(
        attn.reshape(1, a["d"]), a["x2"], a["packed"], a["s1"], a["sc1"],
        a["b1"], a["sc2"], a["b2"], clip_val=100.0, a8=True,
        residual=a["res"], mode="ternary",
    )
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out_r))
    np.testing.assert_array_equal(np.asarray(kc_m), np.asarray(kc_r))
    np.testing.assert_array_equal(np.asarray(vc_m), np.asarray(vc_r))


def test_pick_bs_invariants():
    # flagship ternary: s1=512, s2=2048, C=8 -> 256 (n_kt=10 >= 8, n_a=2)
    assert _pick_bs(512, 2048, 8) == 256
    # 7B ternary: s1=1024, s2=4096, C=8 -> 512 (n_kt=10, n_a=2)
    assert _pick_bs(1024, 4096, 8) == 512
    # binary flagship: s1=256, s2=1024, C=8 -> 128 (n_kt=10, n_a=2)
    assert _pick_bs(256, 1024, 8) == 128
    # no dividing block -> None
    assert _pick_bs(512, 2000, 8) is None
    for s1, s2, C in ((512, 2048, 8), (1024, 4096, 8), (256, 1024, 8)):
        bs = _pick_bs(s1, s2, C)
        n_kt = (s1 + s2) // bs
        n_a = s1 // bs
        assert n_kt >= C and C - 1 <= n_kt - n_a


def _tiny_fused_model():
    cfg = phi.PhiConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512,
    )
    d, f = cfg.hidden_size, cfg.intermediate_size
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, cfg.num_hidden_layers * 4 + 2)

    def mk(k, kdim, ndim):
        return {
            "packed": pack_ternary(jax.random.normal(k, (kdim, ndim))),
            "scale": jnp.full((ndim,), 0.02, jnp.float32),
            "b": jnp.zeros((ndim,), jnp.bfloat16),
        }

    layers = []
    for i in range(cfg.num_hidden_layers):
        kk = ks[i * 4:(i + 1) * 4]
        layers.append({
            "ln": {"scale": jnp.ones((d,), jnp.bfloat16),
                   "bias": jnp.zeros((d,), jnp.bfloat16)},
            "wqkv": mk(kk[0], d, 3 * d), "out_proj": mk(kk[1], d, d),
            "fc1": mk(kk[2], d, f), "fc2": mk(kk[3], f, d),
        })
    params = {
        "wte": (jax.random.normal(ks[-2], (cfg.vocab_size, d)) * 0.02).astype(jnp.bfloat16),
        "layers": layers,
        "lm_head": {
            "ln": {"scale": jnp.ones((d,), jnp.bfloat16),
                   "bias": jnp.zeros((d,), jnp.bfloat16)},
            "linear": {"w": (jax.random.normal(ks[-1], (d, cfg.vocab_size)) * 0.02).astype(jnp.bfloat16),
                       "b": jnp.zeros((cfg.vocab_size,), jnp.bfloat16)},
        },
    }
    spec = phi.LinearSpec(kind="packed", mode="ternary", clip_val=100.0, a8=True)
    specs = tuple({n: spec for n in phi.QUANT_LINEARS}
                  for _ in range(cfg.num_hidden_layers))
    params, specs = fuse_packed_decoder_params(params, specs)
    return cfg, params, phi.freeze_specs(specs)


def test_decode_layer_flag_on_off_identical(monkeypatch):
    cfg, params, specs = _tiny_fused_model()
    cache = phi.init_cache(cfg, 1, 128, jnp.bfloat16)
    emb = (jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.hidden_size))
           * 0.1).astype(jnp.bfloat16)
    logits_p, cache = phi.forward(params, cfg, specs, emb, cache, 0)
    step = (jax.random.normal(jax.random.PRNGKey(3), (1, 1, cfg.hidden_size))
            * 0.1).astype(jnp.bfloat16)

    monkeypatch.setattr(phi, "USE_ATTN_OUT2_FUSION", True)
    lo_on, cache_on = phi.forward(params, cfg, specs, step, [tuple(c) for c in cache], 8)
    monkeypatch.setattr(phi, "USE_ATTN_OUT2_FUSION", False)
    lo_off, cache_off = phi.forward(params, cfg, specs, step, [tuple(c) for c in cache], 8)

    np.testing.assert_array_equal(np.asarray(lo_on), np.asarray(lo_off))
    for (k1, v1), (k2, v2) in zip(cache_on, cache_off):
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
