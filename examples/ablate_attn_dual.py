#!/usr/bin/env python
"""Busy-time ablation of the merged attn+out2 kernel (round-5 7B batch-1
study; DESIGN.md §6 methodology: swap ONE thing, read busy time from the
xplane, ignore wall-clock on this transport).

Variants at 7B decode shapes (h=32, hd=128, f=16384, cap=1024, live=96):
  pair      — fused_decode_attention + dual_ternary_matmul (baseline)
  merged    — the merged kernel, "arbitrary" j semantics
  merged-p  — the merged kernel, "parallel" j semantics (experiment only)
  noattn    — merged kernel with the attention chunk branch compiled out
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ternary_vllm_tpu.ops import attn_out2_fused as m
from ternary_vllm_tpu.ops.decode_attention import pick_decode_chunk
from ternary_vllm_tpu.ops.fused_decode_attention import fused_decode_attention
from ternary_vllm_tpu.ops.packing import pack_ternary
from ternary_vllm_tpu.ops.ternary_matmul import dual_ternary_matmul
from ternary_vllm_tpu.utils.trace_summary import hlo_op_table

H, HD, KVH, CAP, F, POS = 32, 128, 32, 1024, 16384, 96
ITERS = 64


def build():
    d = H * HD
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    q = (jax.random.normal(ks[0], (1, H, HD)) * 0.3).astype(jnp.bfloat16)
    kn = (jax.random.normal(ks[1], (1, KVH, HD)) * 0.3).astype(jnp.bfloat16)
    vn = (jax.random.normal(ks[2], (1, KVH, HD)) * 0.3).astype(jnp.bfloat16)
    rd = HD // 2
    cos = jnp.cos(jax.random.normal(ks[3], (1, rd))).astype(jnp.float32)
    sin = jnp.sin(jax.random.normal(ks[4], (1, rd))).astype(jnp.float32)
    kc = (jax.random.normal(ks[5], (1, KVH, CAP, HD)) * 0.3).astype(jnp.bfloat16)
    vc = (jax.random.normal(ks[6], (1, KVH, CAP, HD)) * 0.3).astype(jnp.bfloat16)
    x2 = (jax.random.normal(ks[7], (1, F)) * 0.5).astype(jnp.bfloat16)
    res = (jax.random.normal(ks[8], (1, d)) * 0.5).astype(jnp.bfloat16)
    w1 = jax.random.normal(ks[9], (d, d))
    w2 = jax.random.normal(ks[10], (F, d))
    packed = jnp.concatenate([pack_ternary(w1), pack_ternary(w2)], axis=0)
    s1 = d // 4
    sc1 = jnp.full((1, d), 0.02, jnp.float32)
    sc2 = jnp.full((1, d), 0.03, jnp.float32)
    b1 = jnp.zeros((1, d), jnp.float32)
    b2 = jnp.full((1, d), 0.1, jnp.float32)
    return dict(q=q, kn=kn, vn=vn, cos=cos, sin=sin, kc=kc, vc=vc, x2=x2,
                res=res, packed=packed, s1=s1, sc1=sc1, sc2=sc2, b1=b1, b2=b2,
                rd=rd, d=d)


def run_traced(tag, fn, a):
    @jax.jit
    def loop(kc, vc):
        def body(_, carry):
            kc, vc, acc = carry
            out, kc2, vc2 = fn(kc, vc, acc)
            if kc2.shape == kc.shape:
                kc, vc = kc2, vc2
            return kc, vc, acc + out.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, ITERS, body, (kc, vc, jnp.float32(0.0)))

    r = loop(a["kc"], a["vc"])
    jax.block_until_ready(r)
    logdir = f"/tmp/abl-{tag}"
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        r = loop(a["kc"], a["vc"])
        jax.block_until_ready(r)
    rows = hlo_op_table(logdir)
    tot = {}
    for rr in rows:
        if rr["occurrences"] == ITERS:
            nm = rr["op"].split(".")[0]
            tot[nm] = tot.get(nm, 0.0) + rr["avg_us"]
    print(f"[{tag}] per-iter: " + "  ".join(f"{k}={v:.2f}us" for k, v in
          sorted(tot.items(), key=lambda kv: -kv[1])[:5]), flush=True)
    return sum(tot.values())


def main():
    a = build()
    chunk = pick_decode_chunk(CAP, KVH, HD, jnp.bfloat16)
    s2_rows = a["packed"].shape[0] - a["s1"]
    bs = m._pick_bs(a["s1"], s2_rows, CAP // chunk)
    pos = jnp.int32(POS)

    def pair(kc, vc, acc=0.0):
        attn, kc, vc = fused_decode_attention(
            a["q"], a["kn"], a["vn"], a["cos"], a["sin"], kc, vc, pos,
            rotary_dim=a["rd"])
        out = dual_ternary_matmul(
            attn.reshape(1, a["d"]), a["x2"], a["packed"], a["s1"],
            a["sc1"][0], a["b1"][0], a["sc2"][0], a["b2"][0],
            clip_val=100.0, a8=True, residual=a["res"], mode="ternary")
        return out, kc, vc

    def merged(kc, vc, acc=0.0, ablate=0, sem0="arbitrary", chunk_=None, bn_=512):
        q = a["q"] + jnp.bfloat16(0.0) * acc  # defeat loop-invariant hoisting
        return m._attn_dual_pallas(
            q, a["kn"], a["vn"], a["cos"], a["sin"], kc, vc, pos,
            a["x2"], a["packed"], a["sc1"], a["b1"], a["sc2"], a["b2"],
            a["res"], s1=a["s1"], rotary_dim=a["rd"], chunk=chunk_ or chunk,
            clip_val=100.0, mode="ternary", bs=bs, bn=bn_,
            out_dtype=jnp.bfloat16, ablate=ablate, sem0=sem0)

    t0 = run_traced("pair", pair, a)
    t1 = run_traced("merged", lambda kc, vc, acc: merged(kc, vc, acc), a)
    t2 = run_traced("mergedp", lambda kc, vc, acc: merged(kc, vc, acc, sem0="parallel"), a)
    t3 = run_traced("noattn", lambda kc, vc, acc: merged(kc, vc, acc, ablate=1), a)
    t4 = run_traced("noattn-flatA", lambda kc, vc, acc: merged(kc, vc, acc, ablate=5), a)
    t5 = run_traced("matmul-only", lambda kc, vc, acc: merged(kc, vc, acc, ablate=7), a)
    t6 = run_traced("matmul-tinykv", lambda kc, vc, acc: merged(kc, vc, acc, ablate=15), a)
    t8 = run_traced("matmul-trivmaps", lambda kc, vc, acc: merged(kc, vc, acc, ablate=47), a)
    t9 = run_traced("matmul-noout", lambda kc, vc, acc: merged(kc, vc, acc, ablate=63), a)
    ta = run_traced("merged-bn2048", lambda kc, vc, acc: merged(kc, vc, acc, bn_=2048), a)
    tb = run_traced("merged-bn4096", lambda kc, vc, acc: merged(kc, vc, acc, bn_=4096), a)
    print(f"matmul-tinykv={t6:.2f} matmul-trivmaps={t8:.2f} matmul-noout={t9:.2f} "
          f"bn2048={ta:.2f} bn4096={tb:.2f}", flush=True)
    print(f"totals: pair={t0:.2f} merged={t1:.2f} merged-parallel={t2:.2f} "
          f"noattn={t3:.2f} noattn-flatA={t4:.2f} matmul-only={t5:.2f} "
          f"us/iter", flush=True)


if __name__ == "__main__":
    main()
