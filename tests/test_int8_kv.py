"""INT8 KV cache: parity with bf16/f32 cache within quantization tolerance,
decode-loop support, per-slot-position support (north-star capability,
BASELINE.md config 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi

CFG = phi.TINY_PHI_CONFIG


def _params():
    return phi.init_phi_params(jax.random.PRNGKey(0), CFG)


def test_int8_cache_structure():
    cache = phi.init_cache(CFG, 2, 16, "int8")
    assert len(cache[0]) == 4
    kq, ks, vq, vs = cache[0]
    assert kq.dtype == jnp.int8 and ks.dtype == jnp.bfloat16
    assert kq.shape == (2, CFG.num_key_value_heads, 16, CFG.head_dim)
    # scales are LANE-major (B, KVH, 1, T): the attention kernels scale the
    # logits/probabilities per position (lane dim) instead of dequantizing K/V
    assert ks.shape == (2, CFG.num_key_value_heads, 1, 16)
    assert vs.shape == (2, CFG.num_key_value_heads, 1, 16)


def test_int8_decode_close_to_f32():
    params = _params()
    specs = phi.layer_specs(CFG)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, CFG.vocab_size, (1, 8)))
    emb = phi.embed_tokens(params, ids)

    ref_cache = phi.init_cache(CFG, 1, 16, jnp.float32)
    ref_logits, _ = phi.forward(params, CFG, specs, emb, ref_cache, 0)

    q_cache = phi.init_cache(CFG, 1, 16, "int8")
    q_logits, q_cache = phi.forward(params, CFG, specs, emb, q_cache, 0)

    # int8 KV quantization error is small but nonzero
    ref = np.asarray(ref_logits)
    err = np.abs(np.asarray(q_logits) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, err

    # greedy continuation matches for a few tokens
    nxt_ref = int(jnp.argmax(ref_logits[0, -1]))
    nxt_q = int(jnp.argmax(q_logits[0, -1]))
    assert nxt_ref == nxt_q


def test_int8_cache_incremental_consistency():
    """Prefill-then-decode through the int8 cache equals one-shot int8 prefill
    (the quantizer is deterministic per position)."""
    params = _params()
    specs = phi.layer_specs(CFG)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, CFG.vocab_size, (1, 6)))
    emb = phi.embed_tokens(params, ids)

    c1 = phi.init_cache(CFG, 1, 8, "int8")
    full_logits, c1 = phi.forward(params, CFG, specs, emb, c1, 0)

    c2 = phi.init_cache(CFG, 1, 8, "int8")
    la, c2 = phi.forward(params, CFG, specs, emb[:, :3], c2, 0)
    logits_parts = [la]
    for t in range(3, 6):
        lg, c2 = phi.forward(params, CFG, specs, emb[:, t : t + 1], c2, t)
        logits_parts.append(lg)
    inc = jnp.concatenate(logits_parts, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc, np.float32), np.asarray(full_logits, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_int8_with_vector_positions():
    params = _params()
    specs = phi.layer_specs(CFG)
    emb = phi.embed_tokens(params, jnp.asarray([[3], [4]]))
    cache = phi.init_cache(CFG, 2, 8, "int8")
    pos = jnp.asarray([0, 2], jnp.int32)
    logits, cache = phi.forward(params, CFG, specs, emb, cache, pos)
    assert logits.shape == (2, 1, CFG.vocab_size)
    # written slots are non-zero at each row's position
    kq = cache[0][0]
    assert int(jnp.sum(jnp.abs(kq[0, :, 0]))) > 0
    assert int(jnp.sum(jnp.abs(kq[1, :, 2]))) > 0
    assert int(jnp.sum(jnp.abs(kq[1, :, 0]))) == 0


def test_decoder_class_int8():
    from ternary_vllm_tpu.serve.decode import Decoder

    params = _params()
    dec = Decoder(params, CFG, phi.layer_specs(CFG), max_len=32, cache_dtype="int8")
    emb = phi.embed_tokens(params, jnp.asarray([[1, 2, 3]]))
    tokens, n, _ = dec.generate(emb, max_new_tokens=5)
    assert n == 5
