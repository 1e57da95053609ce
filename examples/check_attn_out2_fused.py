#!/usr/bin/env python
"""On-TPU numerics + timing check for ops/attn_out2_fused.

Compares the merged attention+out2 kernel against the composed pair
(fused_decode_attention -> dual_ternary_matmul) at flagship and 7B decode
shapes: outputs and cache writes must match bit-for-bit (same f32 op
sequence).  Run on a real TPU (the merged kernel falls back off-TPU):

    python examples/check_attn_out2_fused.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.ops import attn_out2_fused as m
from ternary_vllm_tpu.ops.fused_decode_attention import fused_decode_attention
from ternary_vllm_tpu.ops.packing import pack_binary, pack_ternary
from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul


def check(h, hd, kvh, cap, f, pos_val, mode="ternary", seed=0):
    d = h * hd
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 12)
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
    w1 = jax.random.normal(ks[9], (d, d))
    w2 = jax.random.normal(ks[10], (f, d))
    if mode == "ternary":
        packed = jnp.concatenate([pack_ternary(w1), pack_ternary(w2)], axis=0)
        s1 = d // 4
    else:
        packed = jnp.concatenate(
            [pack_binary(w1, zero_one=(mode == "binary01")),
             pack_binary(w2, zero_one=(mode == "binary01"))], axis=0
        )
        s1 = d // 8
    sc1 = jnp.full((d,), 0.02, jnp.float32)
    sc2 = jnp.full((d,), 0.03, jnp.float32)
    b1 = jnp.zeros((d,), jnp.float32)
    b2 = jnp.full((d,), 0.1, jnp.float32)
    pos = jnp.int32(pos_val)

    # call the kernel with the SAME chunk as the standalone attention kernel
    # so the online-softmax accumulation order matches bit-for-bit (the
    # policy chunk may differ, which only reassociates f32 adds)
    from ternary_vllm_tpu.ops.decode_attention import pick_decode_chunk

    chunk = pick_decode_chunk(cap, kvh, hd, kc.dtype)
    s2_rows = packed.shape[0] - s1
    out_m, kc_m, vc_m = m._attn_dual_pallas(
        q, kn, vn, cos, sin, kc, vc, pos, x2, packed,
        sc1.reshape(1, d), b1.reshape(1, d), sc2.reshape(1, d), b2.reshape(1, d),
        res, s1=s1, rotary_dim=rd, chunk=chunk, clip_val=100.0, mode=mode,
        bs=m._pick_bs(s1, s2_rows, cap // chunk),
        bn=512 if d % 512 == 0 else 256, out_dtype=x2.dtype,
    )
    # composed reference (fresh cache copies: the merged call donated kc/vc)
    kc2 = kc + 0
    vc2 = vc + 0
    attn, kc_r, vc_r = fused_decode_attention(
        q, kn, vn, cos, sin, kc2, vc2, pos, rotary_dim=rd
    )
    out_r = dual_ternary_matmul(
        attn.reshape(1, d), x2, packed, s1, sc1, b1, sc2, b2,
        clip_val=100.0, a8=True, residual=res, mode=mode,
    )
    jax.block_until_ready((out_m, out_r))
    do = float(jnp.max(jnp.abs(out_m.astype(jnp.float32) - out_r.astype(jnp.float32))))
    dk = float(jnp.max(jnp.abs(kc_m.astype(jnp.float32) - kc_r.astype(jnp.float32))))
    dv = float(jnp.max(jnp.abs(vc_m.astype(jnp.float32) - vc_r.astype(jnp.float32))))

    # policy path (attn_dual_decode picks its own chunk -> f32 reassociation
    # only; loose gate)
    out_p, _, _ = m.attn_dual_decode(
        q, kn, vn, cos, sin, kc + 0, vc + 0, pos, x2, packed, s1, sc1, b1,
        sc2, b2, res, rotary_dim=rd, clip_val=100.0, mode=mode,
    )
    dp = float(jnp.max(jnp.abs(out_p.astype(jnp.float32) - out_r.astype(jnp.float32))))

    tag = f"h={h} hd={hd} kvh={kvh} cap={cap} f={f} pos={pos_val} {mode}"
    ok = do == 0.0 and dk == 0.0 and dv == 0.0 and dp < 0.1
    print(f"[{'OK' if ok else 'FAIL'}] {tag}: d_out={do:.3e} d_k={dk:.3e} "
          f"d_v={dv:.3e} d_policy={dp:.3e}", flush=True)
    return ok


def main():
    cases = [
        # flagship shapes (Phi-1.4B: 32h x 64hd, f=8192), several positions
        dict(h=32, hd=64, kvh=32, cap=1024, f=8192, pos_val=64),
        dict(h=32, hd=64, kvh=32, cap=1024, f=8192, pos_val=127),
        dict(h=32, hd=64, kvh=32, cap=1024, f=8192, pos_val=128),
        dict(h=32, hd=64, kvh=32, cap=1024, f=8192, pos_val=1023),
        dict(h=32, hd=64, kvh=32, cap=1024, f=8192, pos_val=0),
        # GQA
        dict(h=32, hd=64, kvh=8, cap=1024, f=8192, pos_val=200),
        # 7B shapes (32h x 128hd, f=16384)
        dict(h=32, hd=128, kvh=32, cap=1024, f=16384, pos_val=100),
        # binary mode
        dict(h=32, hd=64, kvh=32, cap=1024, f=8192, pos_val=77, mode="binary"),
    ]
    ok = all(check(**c) for c in cases)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
