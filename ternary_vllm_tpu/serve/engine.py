"""Continuous-batching serving engine: slotted KV cache, mixed prefill/decode.

Net-new capability (the reference serves one request at a time through the
TFLite interpreter, ``test_tflite.py:152-219``; BASELINE.md config 5 calls for
continuous batching).  TPU-first design:

* One fixed-shape slotted KV cache ``(max_batch, H, max_len, hd)`` per layer —
  static shapes, so exactly THREE compiled programs serve every workload:
  prefill-into-slot (one per prompt bucket), batched decode step, both with
  per-slot position vectors (``pos: (B,)``) threaded through the model.
* Decode steps run for ALL active slots every iteration; finished/empty slots
  are masked (their sampled token is discarded).  New requests prefill into
  free slots between decode steps — classic iteration-level scheduling.
* The Python layer only schedules; all tensor work is jitted.
"""

from __future__ import annotations

import dataclasses
import itertools
import logging
import time
from collections import deque
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi

_logger = logging.getLogger(__name__)


@dataclasses.dataclass
class Request:
    #: (1, T, D) float embeddings, or None to embed ``prompt_ids`` on device
    #: (text prompts: ids upload in KBs where embeds cost MBs — this
    #: transport moves ~20-30 MB/s, so an 8k-prompt embed roundtrip was
    #: ~3 s of admission wall time).  Suffix only when ``prefix_id`` is set.
    prompt_embeds: Any = None
    max_new_tokens: int = 64
    eos_id: int = -1
    request_id: int = 0
    on_token: Optional[Callable[[int, "Request"], None]] = None  # streaming cb
    prefix_id: Optional[int] = None  # shared-prefix KV (see register_prefix)
    prompt_ids: Optional[Any] = None  # (1, T) int32 — seeds n-gram speculation
    # filled by the engine:
    tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    slot: int = -1
    submit_time: float = 0.0
    finish_time: float = 0.0


def _splice_slot(cache, local, slot):
    """Write a 1-row local cache into row ``slot`` of the engine cache.
    Tuple-generic: works for bf16 (k, v) pairs and int8 4-tuples alike —
    every cache array is row-major on the batch dim."""
    new_cache = []
    for kv, lkv in zip(cache, local):
        new_cache.append(tuple(
            jax.lax.dynamic_update_slice(c, l.astype(c.dtype), (slot,) + (0,) * (c.ndim - 1))
            for c, l in zip(kv, lkv)
        ))
    return new_cache


@partial(
    jax.jit,
    static_argnames=("config", "specs", "bucket", "cache_dtype", "tp", "layout", "from_ids"),
    donate_argnums=(4,),
)
def _prefill_into(params, config, specs, embeds, cache, slot, tokens, pos, prompt_len, *, bucket, cache_dtype="bf16", tp=None, layout="rowmajor", from_ids=False):
    """Prefill + splice into the engine cache + record the first token, in
    ONE dispatch (this transport charges ~10-35 ms per host round-trip, so
    the old prefill→install→argmax-fetch admission cost 3 round trips per
    request).  ``slot`` and ``prompt_len`` are traced scalars — only the
    bucket shape recompiles.  ``from_ids``: ``embeds`` is (1, bucket) int32
    token ids, embedded here (device-side) instead of on the host."""
    if from_ids:
        embeds = phi.embed_tokens(params, embeds)
    local = phi.init_cache(config, 1, bucket, _CACHE_DTYPES[cache_dtype])
    logits, local = _forward(params, config, specs, embeds, local, 0, tp)
    if layout == "tmajor":
        # prefill runs row-major (the chunk-prefill kernels need it); the
        # engine cache is T-major — transpose the bucket-sized local once
        local = phi.transpose_cache(local)
    new_cache = _splice_slot(cache, local, slot)
    last = jax.lax.dynamic_index_in_dim(logits[0], prompt_len - 1, axis=0, keepdims=False)
    first = jnp.argmax(last).astype(jnp.int32)
    tokens = tokens.at[slot].set(first)
    pos = pos.at[slot].set(prompt_len)
    return new_cache, tokens, pos


_CACHE_DTYPES = {"bf16": jnp.bfloat16, "int8": "int8"}

# int8-KV pays a fixed per-step quantize cost but halves live-context HBM
# traffic; measured crossover is ~1024 live tokens (bench_kv.py: 0.96x at
# prompt 64 / cache 1024, 1.08-1.12x at 1024-1792 live tokens — BENCHMARKS.md).
# "auto" picks int8 whenever the cache is big enough that requests are
# expected to spend most of their decode beyond the crossover.
_AUTO_INT8_MIN_LEN = 2048


def resolve_cache_layout(cache_layout: str, max_len: int, head_dim: int, tp) -> str:
    """Resolve ``cache_layout="auto"``: T-major ``(B, KVH, hd, T)`` when the
    engine is long-context (max_len ≥ 2048) and head_dim < 128 — the
    row-major cache is lane-padded to 128 inside the jitted decode loop, so
    decode attention streams 2× the logical KV bytes (round-4 study,
    docs/DESIGN.md §6: 176 → 97 µs/layer at 8k).  hd ≥ 128 is never padded
    (no benefit), and the TP paths keep row-major this round."""
    if cache_layout == "auto":
        if max_len >= 2048 and head_dim < 128 and tp is None:
            return "tmajor"
        return "rowmajor"
    return cache_layout


def resolve_cache_dtype(cache_dtype: str, max_len: int, head_dim: int = 64) -> str:
    """Resolve the ``cache_dtype="auto"`` policy: int8 when ``max_len`` ≥
    ``_AUTO_INT8_MIN_LEN`` (long-context workload — int8 wins past ~1024 live
    tokens on the hd=64 flagship) AND ``head_dim < 128`` — on the 7B-class
    hd=128 config int8 measured a net LOSS at every context tried
    (0.93-0.97x, BENCHMARKS.md 7B section: the per-step quantize fixed cost
    outgrows the KV-byte saving).  Explicit "bf16"/"int8" pass through."""
    if cache_dtype == "auto":
        if max_len >= _AUTO_INT8_MIN_LEN and head_dim < 128:
            return "int8"
        return "bf16"
    return cache_dtype


def _forward(params, config, specs, embeds, cache, pos, tp):
    """Model dispatch: single-chip :func:`phi.forward`, or the tensor-parallel
    shard_map path when ``tp = (mesh, axis, a8)`` is set (params must be in
    :func:`phi_tp.tp_relayout_packed_params` layout)."""
    if tp is None:
        return phi.forward(params, config, specs, embeds, cache, pos)
    from ternary_vllm_tpu.models import phi_tp

    mesh, axis, a8 = tp
    return phi_tp.tp_forward(
        params, config, embeds, cache, pos, mesh=mesh, axis=axis, a8=a8
    )


@partial(
    jax.jit,
    static_argnames=("config", "specs", "temperature", "n_steps", "tp"),
    donate_argnums=(3,),
)
def _decode_burst(params, config, specs, cache, tokens, pos, key, temperature, active, eos_ids, n_steps, tp=None):
    """``n_steps`` fused decode iterations over all slots — one dispatch per
    burst instead of per token (host round-trips dominate short steps on
    remote-attached TPUs).  Slots stop advancing once they emit their eos.

    Returns (token_matrix (B, n_steps), cache, new_pos)."""
    b = tokens.shape[0]
    from ternary_vllm_tpu.serve.sampling import sample_token

    # lax.while_loop like serve.decode.decode_loop (the scan variant showed
    # ~73 one-time whole-cache "data formatting" copies per dispatch in the
    # 8k trace; XLA overlapped them — switching measured neutral t/s — but
    # the while form keeps the donated cache aliased in place and the two
    # decode loops structurally identical).  Tokens land in a preallocated
    # (B, 1 + n_steps) buffer — column 0 = the entry token (the prefill's
    # first token for freshly admitted slots) so the engine's single
    # post-burst fetch covers it.
    toks0 = jnp.zeros((b, 1 + n_steps), jnp.int32)
    toks0 = jax.lax.dynamic_update_slice(toks0, tokens[:, None], (0, 0))

    def cond(carry):
        i, *_ = carry
        return i < n_steps

    def body(carry):
        i, tok, cache, pos, act, k, toks = carry
        embeds = phi.embed_tokens(params, tok[:, None])
        logits, cache = _forward(params, config, specs, embeds, cache, pos, tp)
        k, sub = jax.random.split(k)
        nxt = sample_token(logits[:, -1], sub, temperature=temperature)
        nxt = jnp.where(act, nxt, tok)
        pos = jnp.where(act, pos + 1, pos)
        act = jnp.logical_and(act, nxt != eos_ids)
        toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, i + 1))
        return (i + 1, nxt, cache, pos, act, k, toks)

    _, tok, cache, pos, act, _, toks_all = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens, cache, pos, active, key, toks0)
    )
    return toks_all, cache, pos  # (B, 1 + n_steps)


@partial(
    jax.jit,
    static_argnames=("config", "specs", "bucket", "first_chunk", "tp", "from_ids", "need_logits"),
    donate_argnums=(4,),
)
def _prefill_chunk(params, config, specs, emb_full, local, chunk_off, start_pos, chunk_len, *, bucket, first_chunk, tp=None, from_ids=False, need_logits=True):
    """One chunk of a long-prompt prefill into a slot-local full-capacity
    cache (chunked admission: a prompt longer than the largest bucket is
    split into sequential bucket-sized prefills at advancing ``start_pos``;
    each chunk attends to all previous chunks' KV through the cache).  The
    first chunk uses the pure-causal flash prefill path (static pos=0).

    ``emb_full`` is the WHOLE (padded) prompt, uploaded once by the caller;
    the chunk is sliced device-side (``bucket`` rows at ``chunk_off``) — a
    per-chunk host slice re-uploads megabytes per chunk through the
    transport, which round-4 traces showed dominating admission wall time
    (device 0.45 s vs wall 1.6 s at 8k).  Rows past ``chunk_len`` are
    pad/garbage: their cache writes land beyond the live region, which no
    later query attends before the next chunk overwrites them (same
    argument as bucket padding).

    Returns ``(local, first)`` where ``first`` is the greedy token at the
    chunk's last true position — only the LAST chunk's value is used."""
    if from_ids:  # (1, P) int32: slice the ids, embed device-side
        ids = jax.lax.dynamic_slice(emb_full, (0, chunk_off), (1, bucket))
        embeds = phi.embed_tokens(params, ids)
    else:
        d = emb_full.shape[-1]
        embeds = jax.lax.dynamic_slice(emb_full, (0, chunk_off, 0), (1, bucket, d))
    pos = 0 if first_chunk else start_pos
    if not need_logits and tp is None:
        # non-final chunks only feed the KV cache — skip the lm_head (the
        # (bucket, V) logits cost ~1.3 ms of w8a8 matmul + ~210 MB of
        # HBM writes/reads per 1024-chunk on the flagship)
        _, local = phi.forward(
            params, config, specs, embeds, local, pos, return_hidden=True
        )
        return local, jnp.int32(0)
    logits, local = _forward(params, config, specs, embeds, local, pos, tp)
    last = jax.lax.dynamic_index_in_dim(logits[0], chunk_len - 1, axis=0, keepdims=False)
    first = jnp.argmax(last).astype(jnp.int32)
    return local, first


@partial(jax.jit, donate_argnums=(0,), static_argnames=("layout",))
def _install_local(cache, local, slot, tokens, pos, first, total_len, *, layout="rowmajor"):
    """Splice a fully prefilled slot-local cache into the engine cache and
    record the first token + position — the chunked-admission epilogue."""
    if layout == "tmajor":
        local = phi.transpose_cache(local)
    new_cache = _splice_slot(cache, local, slot)
    tokens = tokens.at[slot].set(first)
    pos = pos.at[slot].set(total_len)
    return new_cache, tokens, pos


@partial(jax.jit, static_argnames=("config", "specs", "bucket", "cache_dtype", "tp"))
def _prefill_prefix(params, config, specs, embeds, prompt_len, *, bucket, cache_dtype="bf16", tp=None):
    """Prefill a shared PREFIX (system prompt / image embeddings) once;
    returns its stacked per-array KV blocks (a tuple of (L, 1, ...) arrays,
    one per cache-tuple element) for reuse by :func:`_prefill_suffix_into`.
    Slots past ``prompt_len`` hold pad-token KV that suffix prefill
    overwrites / never attends (same argument as bucketed prompt padding)."""
    del prompt_len  # kept in host metadata; padding slots are harmless
    cache = phi.init_cache(config, 1, bucket, _CACHE_DTYPES[cache_dtype])
    _, cache = _forward(params, config, specs, embeds, cache, 0, tp)
    n = len(cache[0])
    return tuple(jnp.stack([kv[i] for kv in cache]) for i in range(n))


@partial(
    jax.jit,
    static_argnames=("config", "specs", "pbucket", "sbucket", "cache_dtype", "tp", "layout", "from_ids"),
    donate_argnums=(5,),
)
def _prefill_suffix_into(
    params, config, specs, suffix_emb, prefix_blocks, cache, slot, tokens, pos,
    prefix_len, suffix_len, *, pbucket, sbucket, cache_dtype="bf16", tp=None,
    layout="rowmajor", from_ids=False,
):
    """Admission with a cached prefix, in ONE dispatch: seed a local cache
    with the prefix KV block, prefill only the suffix at ``pos=prefix_len``
    (its writes land contiguously after the live prefix, overwriting prefix
    pad slots), splice into the engine cache, record the first token."""
    if from_ids:
        suffix_emb = phi.embed_tokens(params, suffix_emb)
    local = phi.init_cache(config, 1, pbucket + sbucket, _CACHE_DTYPES[cache_dtype])
    seeded = []
    for i, lkv in enumerate(local):
        seeded.append(tuple(
            jax.lax.dynamic_update_slice(l, blk[i].astype(l.dtype), (0,) * l.ndim)
            for l, blk in zip(lkv, prefix_blocks)
        ))
    logits, seeded = _forward(params, config, specs, suffix_emb, seeded, prefix_len, tp)
    if layout == "tmajor":
        seeded = phi.transpose_cache(seeded)
    new_cache = _splice_slot(cache, seeded, slot)
    last = jax.lax.dynamic_index_in_dim(logits[0], suffix_len - 1, axis=0, keepdims=False)
    first = jnp.argmax(last).astype(jnp.int32)
    tokens = tokens.at[slot].set(first)
    pos = pos.at[slot].set(prefix_len + suffix_len)
    return new_cache, tokens, pos


@partial(jax.jit, donate_argnums=(0,))
def _seed_local_prefix(local, prefix_blocks):
    """Seed a slot-local cache with a cached prefix's stacked KV blocks at
    position 0 (chunked-admission-with-prefix prologue; same splice as
    :func:`_prefill_suffix_into`)."""
    out = []
    for i, lkv in enumerate(local):
        out.append(tuple(
            jax.lax.dynamic_update_slice(l, blk[i].astype(l.dtype), (0,) * l.ndim)
            for l, blk in zip(lkv, prefix_blocks)
        ))
    return out


@partial(jax.jit, donate_argnums=(0, 1))
def _seed_history(history, hist_len, slot, prompt_ids, prompt_len, first_token):
    """Reset one slot's speculation history to [prompt ids | first token].
    ``prompt_ids``: (Lp,) int32 padded buffer (unused tail ignored via
    ``prompt_len``); rows admitted without ids pass prompt_len=0."""
    width = history.shape[1]
    col = jnp.arange(width)
    ids_padded = jnp.zeros((width,), jnp.int32)
    ids_padded = jax.lax.dynamic_update_slice(ids_padded, prompt_ids, (0,))
    row = jnp.where(col < prompt_len, ids_padded, 0)
    row = jnp.where(col == prompt_len, first_token, row)
    history = history.at[slot].set(row)
    hist_len = hist_len.at[slot].set(prompt_len + 1)
    return history, hist_len


def _spec_iter(
    params, config, specs, cache, tokens, pos, history, hist_len, active,
    eos_ids, k, n, tp,
):
    """One speculative iteration (greedy slots only): per-slot n-gram
    proposals from the device-side history, ONE verify forward over ``k+1``
    tokens with per-slot vector positions, longest-matching-prefix accept.

    Invariant: ``history[:, :hist_len]`` holds every emitted token per slot
    INCLUDING the current ``tokens`` entry, so the n-gram suffix is current.
    Stale cache rows written for rejected proposals sit beyond each row's
    advanced position and are overwritten before they can be attended (the
    causal mask bounds reads by the row's true position) — the same argument
    as :func:`ternary_vllm_tpu.serve.speculative.speculative_decode_loop`.

    Returns ``(toks_all (B, k+2), n_valid (B,), cache, pos, history,
    hist_len, new_tokens, new_active)``: column 0 is the entry token,
    columns ``1..n_valid`` are the newly emitted tokens per row; rows whose
    accepted run contains their eos are deactivated (burst mode stops them
    device-side; single-step mode frees the slot on the host instead)."""
    from ternary_vllm_tpu.serve.speculative import ngram_propose

    props = ngram_propose(history, hist_len, k=k, n=n)  # (B, k)
    seq = jnp.concatenate([tokens[:, None], props], axis=1)  # (B, k+1)
    embeds = phi.embed_tokens(params, seq)
    logits, cache = _forward(params, config, specs, embeds, cache, pos, tp)
    out = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, k+1)
    match = props == out[:, :k]
    acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # (B,)
    n_valid = jnp.where(active, acc + 1, 0)

    # append accepted tokens to history (inactive rows untouched)
    hcol = jnp.arange(history.shape[1])[None, :]
    for j in range(k + 1):
        can = active & (j <= acc)
        hwrite = can[:, None] & (hcol == (hist_len + j)[:, None])
        history = jnp.where(hwrite, out[:, j][:, None], history)
    hist_len = hist_len + n_valid
    pos = pos + n_valid
    new_tokens = jnp.where(
        active, jnp.take_along_axis(out, acc[:, None], axis=1)[:, 0], tokens
    )
    toks_all = jnp.concatenate([tokens[:, None], out], axis=1)  # (B, k+2)
    jcol = jnp.arange(k + 1)[None, :]
    eos_hit = jnp.any((jcol < n_valid[:, None]) & (out == eos_ids[:, None]), axis=1)
    new_active = active & jnp.logical_not(eos_hit)
    return toks_all, n_valid, cache, pos, history, hist_len, new_tokens, new_active


@partial(
    jax.jit,
    static_argnames=("config", "specs", "k", "n", "tp"),
    donate_argnums=(3, 6, 7),
)
def _spec_decode_step(
    params, config, specs, cache, tokens, pos, history, hist_len, active,
    *, k, n, tp=None,
):
    """Single speculative iteration (see :func:`_spec_iter`); eos handling
    stays on the host (the slot is freed before the next step)."""
    eos_ids = jnp.full_like(tokens, -2)  # never matches: host handles eos
    toks_all, n_valid, cache, pos, history, hist_len, new_tokens, _ = _spec_iter(
        params, config, specs, cache, tokens, pos, history, hist_len, active,
        eos_ids, k, n, tp,
    )
    return toks_all, n_valid, cache, pos, history, hist_len, new_tokens


@partial(
    jax.jit,
    static_argnames=("config", "specs", "k", "n", "n_steps", "tp"),
    donate_argnums=(3, 6, 7),
)
def _spec_decode_burst(
    params, config, specs, cache, tokens, pos, history, hist_len, active,
    eos_ids, *, k, n, n_steps, tp=None,
):
    """``n_steps`` fused speculative iterations — one dispatch per burst
    (host round-trips dominate per-step costs on remote-attached TPUs, and
    each spec iteration otherwise costs one).  Rows stop advancing once an
    accepted run contains their eos.

    Returns ``(toks_seq (n_steps, B, k+2), nvalid_seq (n_steps, B), cache,
    pos, history, hist_len, tokens)``."""

    # while_loop + preallocated output buffers (see _decode_burst's note)
    b = tokens.shape[0]
    toks_seq0 = jnp.zeros((n_steps, b, k + 2), jnp.int32)
    nvalid_seq0 = jnp.zeros((n_steps, b), jnp.int32)

    def cond(carry):
        i, *_ = carry
        return i < n_steps

    def body(carry):
        i, tok, cache, pos, hist, hlen, act, toks_seq, nvalid_seq = carry
        toks_all, n_valid, cache, pos, hist, hlen, tok, act = _spec_iter(
            params, config, specs, cache, tok, pos, hist, hlen, act,
            eos_ids, k, n, tp,
        )
        toks_seq = jax.lax.dynamic_update_slice(
            toks_seq, toks_all[None], (i, 0, 0)
        )
        nvalid_seq = jax.lax.dynamic_update_slice(
            nvalid_seq, n_valid[None], (i, 0)
        )
        return (i + 1, tok, cache, pos, hist, hlen, act, toks_seq, nvalid_seq)

    (_, tok, cache, pos, history, hist_len, _, toks_seq, nvalid_seq) = (
        jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), tokens, cache, pos, history, hist_len, active,
             toks_seq0, nvalid_seq0),
        )
    )
    return toks_seq, nvalid_seq, cache, pos, history, hist_len, tok


@partial(jax.jit, static_argnames=("config", "specs", "temperature", "tp"), donate_argnums=(3,))
def _decode_step(params, config, specs, cache, tokens, pos, key, temperature, active, tp=None):
    """One batched decode step over all slots.

    tokens: (B,) current token per slot; pos: (B,) per-slot lengths;
    active: (B,) bool.  Inactive slots still compute (masked out after) —
    static shapes beat dynamic batch sizes on TPU.
    Returns (next_tokens (B,), cache, new_pos)."""
    embeds = phi.embed_tokens(params, tokens[:, None])
    logits, cache = _forward(params, config, specs, embeds, cache, pos, tp)
    from ternary_vllm_tpu.serve.sampling import sample_token

    nxt = sample_token(logits[:, -1], key, temperature=temperature)
    nxt = jnp.where(active, nxt, tokens)
    pos = jnp.where(active, pos + 1, pos)
    return nxt, cache, pos


class Engine:
    def __init__(
        self,
        params,
        config: phi.PhiConfig,
        specs,
        max_batch: int = 8,
        max_len: int = 2048,
        temperature: float = 0.0,
        seed: int = 0,
        buckets=(32, 64, 128, 256, 512, 1024, 2048),
        burst: int = 1,
        cache_dtype: str = "auto",
        cache_layout: str = "auto",
        mesh=None,
        tp_axis: str = "model",
        tp_a8: bool = False,
        speculative="auto",
        spec_ngram: int = 3,
        spec_miss_limit: int = 4,
        spec_retry_period: int = 64,
        prefill_path: str = "auto",
        adm_chunks_per_step: int = 1,
        expected_len: Optional[int] = None,
    ):
        """``mesh``: a jax Mesh for tensor-parallel serving — ``params`` must
        then be in :func:`phi_tp.tp_relayout_packed_params` layout (use
        :func:`phi_tp.shard_tp_params` to place them); the slotted KV cache is
        head-sharded over ``tp_axis``, decode/prefill run under shard_map with
        one psum per layer, and sampling runs on vocab-sharded logits (GSPMD
        assembles the argmax).  BASELINE.md config 5 composition.

        ``cache_dtype="auto"`` (the default) picks int8 KV when
        ``max_len >= 2048`` and bf16 otherwise (measured crossover ~1024 live
        tokens, BENCHMARKS.md); pass "bf16"/"int8" to override.
        ``expected_len`` describes the workload's typical live length
        (prompt + generation): when set, BOTH auto cache policies key on it
        instead of capacity, so an engine provisioned with headroom
        (``max_len`` 4096) serving short requests keeps the bf16 row-major
        fast path instead of paying int8's short-context tax.

        ``speculative=k`` (greedy engines only) enables prompt-lookup n-gram
        speculation INSIDE the batched engine step: each iteration proposes
        ``k`` tokens per slot from that slot's device-side history and
        verifies them in one forward — accepted runs emit several tokens per
        step with output identical to plain greedy decode (lossless).
        Round-3 measurement (BENCHMARKS.md): k=4 is +30% on repetitive
        output but −34% when proposals never match.  Round 4 made the
        policy ADAPTIVE, so the default is now ON for greedy engines
        (``speculative="auto"`` → k=4 when temperature == 0, off
        otherwise): a slot that misses ``spec_miss_limit`` consecutive
        verifies is paused for ``spec_retry_period`` iterations; when no
        active slot is spec-eligible the engine runs plain decode bursts
        (the always-miss regime costs one verify window per retry period
        instead of one per step); a retry re-seeds the slot's history from
        the host token log (histories go stale during plain decode).

        ``prefill_path`` picks the weight path for ADMISSION forwards only
        (decode and speculative verify always run the packed kernels):
        "dense" dequantizes every packed Linear once at engine build
        (``quantize.unpack_decoder_params``) and prefills with plain bf16
        MXU matmuls.  Round-4 measurement (``bench_prefill.py``, after the
        heads-grouped chunk-attention kernel and ids admission removed the
        real prefill walls): dense is +14% at 4k and −13% at 8k — inside
        run-to-run noise, with a full bf16 weight copy of HBM cost
        (~2.4 GiB on the 1.4B flagship) — so "auto" resolves to "packed"
        and dense stays an explicit opt-in for HBM-rich deployments with
        4k-ish prompts."""
        self.params = params
        self.config = config
        self.specs = phi.freeze_specs(specs) if specs is not None else None
        self.tp = (mesh, tp_axis, tp_a8) if mesh is not None else None
        if prefill_path not in ("auto", "packed", "dense"):
            raise ValueError(f"prefill_path must be auto|packed|dense, got {prefill_path}")
        self.prefill_params, self.prefill_specs = params, self.specs
        has_packed = specs is not None and any(
            s.kind == "packed"
            for spec in phi._spec_dicts(self.specs)
            for s in spec.values()
        )
        if prefill_path == "auto":
            # measured (bench_prefill.py, round 4): packed vs dense admission
            # differ by ~±14% depending on prompt length — not worth a full
            # bf16 weight copy of HBM by default
            prefill_path = "packed"
        if prefill_path == "dense" and has_packed and self.tp is None:
            from ternary_vllm_tpu.quant.quantize import unpack_decoder_params

            pf_params, pf_specs = unpack_decoder_params(
                params, phi._spec_dicts(self.specs), config
            )
            self.prefill_params = pf_params
            self.prefill_specs = phi.freeze_specs(pf_specs)
        self.prefill_path = prefill_path if has_packed and self.tp is None else "packed"
        self.max_batch = max_batch
        if max_len >= 256 and max_len % 256 != 0:
            # the fused decode / chunk-prefill kernels need capacity % chunk
            # == 0 or they silently fall back to full-capacity XLA attention
            # (measured 4-8x decode slowdown at long context) — round UP: a
            # little spare capacity is free, the fallback is not
            rounded = -(-max_len // 256) * 256
            _logger.info(
                "Engine: max_len %d rounded up to %d (fused attention kernels "
                "need capacity %% 256 == 0); KV cache HBM and the "
                "cache_dtype='auto' policy use the rounded value",
                max_len, rounded,
            )
            max_len = rounded
        self.max_len = max_len
        self.temperature = temperature
        self.burst = burst  # fused decode steps per scheduling point
        spec_auto = speculative == "auto"
        if spec_auto:
            speculative = 4 if temperature == 0.0 else 0
        self.spec_k = int(speculative)
        self.spec_n = int(spec_ngram)
        self.spec_miss_limit = int(spec_miss_limit)
        self.spec_retry_period = int(spec_retry_period)
        if self.spec_k and temperature != 0.0:
            raise ValueError("speculative decoding requires temperature=0 (greedy)")
        self.buckets = tuple(b for b in buckets if b <= max_len) or (max_len,)
        if cache_dtype not in _CACHE_DTYPES and cache_dtype != "auto":
            raise ValueError(
                f"cache_dtype must be 'auto' or one of {sorted(_CACHE_DTYPES)}"
            )
        # the auto cache policies key on the EXPECTED live length when the
        # caller provides one (round-4 VERDICT weak #7: a max_len=4096 engine
        # serving 64-token prompts paid int8's short-context tax, 0.96x —
        # capacity is a ceiling, not a workload description)
        policy_len = (
            max_len if expected_len is None
            else max(1, min(int(expected_len), max_len))
        )
        self.cache_dtype = resolve_cache_dtype(cache_dtype, policy_len, config.head_dim)
        self.cache_layout = resolve_cache_layout(
            cache_layout, policy_len, config.head_dim, self.tp
        )
        # T-major engines keep speculation: k+1 verify windows run on the
        # T-major small-chunk kernel (ops/chunk_prefill_attention
        # chunk_prefill_attention_tmajor*; round-4 VERDICT weak #4 — the 8k
        # regime is the slowest decode and gains most from accepted runs)
        self.cache = phi.init_cache(
            config, max_batch, max_len, _CACHE_DTYPES[self.cache_dtype],
            layout=self.cache_layout,
        )
        if self.tp is not None:
            from ternary_vllm_tpu.models import phi_tp

            self.cache = phi_tp.shard_tp_cache(self.cache, mesh, tp_axis)
        self.tokens = jnp.zeros((max_batch,), jnp.int32)
        self.pos = jnp.zeros((max_batch,), jnp.int32)
        if self.spec_k:
            hist_w = max_len + self.spec_k + 2
            self.history = jnp.zeros((max_batch, hist_w), jnp.int32)
            self.hist_len = jnp.zeros((max_batch,), jnp.int32)
            # adaptive speculation state (host side): consecutive zero-accept
            # verifies per slot; iterations left before a paused slot retries
            self._spec_miss: List[int] = [0] * max_batch
            self._spec_pause: List[int] = [0] * max_batch
        # host mirror of per-slot positions (avoids a D2H fetch per step)
        self.pos_host: List[int] = [0] * max_batch
        # slots whose prefill first-token hasn't been reported to the host yet
        self._pending_first: List[bool] = [False] * max_batch
        self.key = jax.random.PRNGKey(seed)
        self.slots: List[Optional[Request]] = [None] * max_batch
        self.queue: deque[Request] = deque()
        self._ids = itertools.count()
        self.completed: List[Request] = []
        # speculation observability: device verify-forwards run and proposals
        # accepted (acceptance rate = spec_accepted / spec_verify_steps, 0..k)
        self.stats = {"spec_verify_steps": 0, "spec_accepted": 0}
        # prefix cache: id -> (kv_blocks, prefix_len, bucket); the KV of a shared
        # prompt prefix (system prompt / image embeddings) prefilled ONCE
        self._prefixes: Dict[int, Any] = {}
        self._prefix_ids = itertools.count()
        # staged chunked admission in flight (at most one): prefill chunks
        # run interleaved with decode bursts so active slots keep decoding
        # while a long prompt admits (see step())
        self._adm: Optional[Dict[str, Any]] = None
        self.adm_chunks_per_step = max(int(adm_chunks_per_step), 1)

    # -- public API ---------------------------------------------------------

    def add_request(
        self,
        prompt_embeds=None,
        max_new_tokens: int = 64,
        eos_id: int = -1,
        on_token: Optional[Callable[[int, Request], None]] = None,
        prefix_id: Optional[int] = None,
        prompt_ids=None,
    ) -> int:
        """Queue a request; ``on_token(token_id, request)`` streams each token
        as it is produced (called from ``step`` on the host).  With
        ``prefix_id`` (from :meth:`register_prefix`), ``prompt_embeds`` is the
        SUFFIX only — the prefix KV is spliced from the cache instead of
        recomputed (the reference recomputes its 729-token image prefill for
        every question, ``test_tflite.py:104-127``).

        TEXT prompts should pass ``prompt_ids`` alone (``prompt_embeds=None``):
        admission then uploads only the int32 ids and embeds them device-side
        inside the prefill dispatch — an 8k prompt's bf16 embeddings are
        ~33 MB, ~3 s of roundtrip on a remote-attached TPU, vs 32 KB of ids.
        ``prompt_embeds`` remains for multimodal inputs (image embeddings)."""
        if prefix_id is not None and prefix_id not in self._prefixes:
            raise KeyError(f"unknown prefix_id {prefix_id}")
        if prompt_embeds is None and prompt_ids is None:
            raise ValueError("add_request needs prompt_embeds or prompt_ids")
        req = Request(
            prompt_embeds=prompt_embeds,
            max_new_tokens=max_new_tokens,
            eos_id=eos_id,
            on_token=on_token,
            prefix_id=prefix_id,
            prompt_ids=prompt_ids,
            request_id=next(self._ids),
            submit_time=time.perf_counter(),
        )
        self.queue.append(req)
        return req.request_id

    def register_prefix(self, prefix_embeds) -> int:
        """Prefill a shared prompt prefix (system prompt, image embeddings)
        ONCE and cache its KV block; returns an id for ``add_request``.
        Cost per reuse drops from a full prefix prefill to one KV splice.
        Prefixes past the largest bucket prefill CHUNKED (same machinery as
        long-prompt admission), so long system prompts / multi-image
        prefixes cache too — up to ``max_len - 1``."""
        t = prefix_embeds.shape[1]
        if t > self.buckets[-1]:
            return self._register_prefix_chunked(prefix_embeds, t)
        b = self._bucket(t)
        emb = np.asarray(prefix_embeds)
        if b > t:
            emb = np.pad(emb, ((0, 0), (0, b - t), (0, 0)))
        blocks = _prefill_prefix(
            self.prefill_params, self.config, self.prefill_specs, jnp.asarray(emb),
            jnp.int32(t), bucket=b, cache_dtype=self.cache_dtype, tp=self.tp,
        )
        pid = next(self._prefix_ids)
        self._prefixes[pid] = (blocks, t, b)
        return pid

    def _register_prefix_chunked(self, prefix_embeds, t: int) -> int:
        if t + 1 > self.max_len:
            raise ValueError(
                f"prefix length {t} needs at least {t + 1} cache slots, "
                f"max_len={self.max_len}"
            )
        local = phi.init_cache(
            self.config, 1, self.max_len, _CACHE_DTYPES[self.cache_dtype]
        )
        if self.tp is not None:
            from ternary_vllm_tpu.models import phi_tp

            local = phi_tp.shard_tp_cache(local, self.tp[0], self.tp[1])
        local, _first, pad_to = self._chunk_prefill_local(
            prefix_embeds, t, 0, local, from_ids=False, need_logits=False
        )
        pb = pad_to  # covers every written (live or pad) position

        def trim(a):
            # capacity axis: scales are lane-major (1, KVH, 1, C) -> axis 3;
            # K/V rows are (1, KVH, C, hd) -> axis 2 (prefill is row-major)
            if a.ndim == 4 and a.shape[2] == 1 and a.shape[3] == self.max_len:
                return a[:, :, :, :pb]
            return a[:, :, :pb]

        n = len(local[0])
        blocks = tuple(
            jnp.stack([trim(kv[i]) for kv in local]) for i in range(n)
        )
        pid = next(self._prefix_ids)
        self._prefixes[pid] = (blocks, t, pb)
        return pid

    def drop_prefix(self, prefix_id: int) -> None:
        """Release a cached prefix's device memory."""
        self._prefixes.pop(prefix_id, None)

    def run(self, max_iters: int = 10_000) -> List[Request]:
        """Drive until queue and slots drain; returns completed requests."""
        it = 0
        while (self.queue or any(s is not None for s in self.slots)) and it < max_iters:
            self.step()
            it += 1
        return self.completed

    # -- scheduling ---------------------------------------------------------

    def _bucket(self, t: int) -> int:
        for b in self.buckets:
            if t <= b:
                return b
        raise ValueError(f"prompt length {t} exceeds largest bucket {self.buckets[-1]}")

    def _admit_chunked(self, req: Request, slot: int):
        """Admit a prompt LONGER than the largest bucket: sequential
        bucket-sized prefills at advancing position into a slot-local
        full-capacity cache, then one splice into the engine cache.

        The engine never rejects a long prompt it has cache capacity for
        (the reference caps context at 2048, ``layers.py:393`` — chunked
        admission serves any prompt up to ``max_len - 1``).  Cost:
        ``ceil(t / largest_bucket) + 1`` dispatches instead of 1; each
        chunk's attention reads the full cache capacity (masked), so
        chunk prefill is O(chunks × max_len) attention — still far cheaper
        than compiling a one-off full-length program per prompt length.

        With ``req.prefix_id`` set, the local cache is seeded from the
        cached prefix KV first and the suffix chunks start at
        ``pos = prefix_len`` — the VLM long-conversation case (image/system
        prefix + long suffix) that the prefix cache exists for (the
        reference recomputes its 729-token image prefill per question,
        ``test_tflite.py:104-127``)."""
        arr, t, from_ids = self._admission_input(req)
        local = self._fresh_local_cache()
        base = 0
        if req.prefix_id is not None:
            blocks, plen, _pbucket = self._prefixes[req.prefix_id]
            local = _seed_local_prefix(local, blocks)
            base = plen
        local, first, _pad_to = self._chunk_prefill_local(
            arr, t, base, local, from_ids, need_logits=True
        )
        self.cache, self.tokens, self.pos = _install_local(
            self.cache, local, jnp.int32(slot), self.tokens, self.pos,
            first, jnp.int32(base + t), layout=self.cache_layout,
        )
        self.pos_host[slot] = base + t

    def _fresh_local_cache(self):
        local = phi.init_cache(self.config, 1, self.max_len, _CACHE_DTYPES[self.cache_dtype])
        if self.tp is not None:
            from ternary_vllm_tpu.models import phi_tp

            local = phi_tp.shard_tp_cache(local, self.tp[0], self.tp[1])
        return local

    def _plan_chunks(self, t: int, base: int):
        """Host-side chunk schedule for a long-prompt prefill; returns
        ``(plan, pad_to)`` with plan entries ``(off, n, bucket)``."""
        chunk = self.buckets[-1]
        plan = []  # (off, n, bucket)
        off = 0
        while off < t:
            n = min(chunk, t - off)
            b = self._bucket(n)
            if base + off + b > self.max_len:
                # The padded bucket would overrun cache capacity: phi's cache
                # write (lax.dynamic_update_slice) silently CLAMPS the start
                # index, overwriting the previous chunk's live KV (reachable
                # with the default buckets whenever max_len % largest_bucket
                # leaves a residue smaller than the chunk's bucket).  Shrink
                # the chunk to the largest bucket that fits the remaining
                # capacity; if no bucket fits, pad to exactly the remainder
                # (n <= max_len - off always holds because admission checks
                # t + 1 <= max_len).
                fit = [bk for bk in self.buckets if base + off + bk <= self.max_len]
                if fit and fit[-1] < n:
                    n = fit[-1]
                    b = n
                else:
                    b = self.max_len - (base + off)
            plan.append((off, n, b))
            off += n
        return plan, max(o + b for o, _, b in plan)

    def _upload_admission(self, arr, t: int, pad_to: int):
        """Pad the prompt to the plan's extent and upload ONCE; each chunk
        slices device-side (_prefill_chunk)."""
        arr_np = np.asarray(arr)
        if pad_to > t:
            pad = ((0, 0), (0, pad_to - t)) + (((0, 0),) if arr_np.ndim == 3 else ())
            arr_np = np.pad(arr_np, pad)
        return jnp.asarray(arr_np)

    def _run_chunk(self, adm, i: int, need_logits: bool):
        off, n, b = adm["plan"][i]
        adm["local"], first = _prefill_chunk(
            self.prefill_params, self.config, self.prefill_specs,
            adm["arr"], adm["local"],
            jnp.int32(off), jnp.int32(adm["base"] + off), jnp.int32(n),
            bucket=b, first_chunk=(adm["base"] + off == 0), tp=self.tp,
            from_ids=adm["from_ids"], need_logits=need_logits,
        )
        return first

    def _chunk_prefill_local(self, arr, t, base, local, from_ids, need_logits=True):
        """Chunk-prefill ``arr`` (embeds or ids) into a slot-local
        full-capacity cache starting at ``base``; returns
        ``(local, first_token, pad_to)``.  Shared by synchronous chunked
        admission and chunked prefix registration."""
        plan, pad_to = self._plan_chunks(t, base)
        adm = {
            "arr": self._upload_admission(arr, t, pad_to),
            "plan": plan, "local": local, "base": base, "from_ids": from_ids,
        }
        first = None
        for i in range(len(plan)):
            f = self._run_chunk(adm, i, need_logits and i == len(plan) - 1)
            if i == len(plan) - 1:
                first = f
        return adm["local"], first, pad_to

    def _start_chunked_admission(self, req: Request, slot: int):
        """Begin a STAGED chunked admission: the slot is reserved and the
        prompt uploaded, but prefill chunks run one (or a few) per ``step``
        interleaved with decode bursts, so active slots keep decoding while
        an 8k prompt admits (round-4 VERDICT weak #3: ``_admit_chunked`` ran
        all chunks back-to-back, freezing every active slot ~0.5 s)."""
        arr, t, from_ids = self._admission_input(req)
        local = self._fresh_local_cache()
        base = 0
        if req.prefix_id is not None:
            blocks, plen, _pbucket = self._prefixes[req.prefix_id]
            local = _seed_local_prefix(local, blocks)
            base = plen
        plan, pad_to = self._plan_chunks(t, base)
        self._adm = {
            "req": req, "slot": slot, "t": t, "base": base,
            "arr": self._upload_admission(arr, t, pad_to),
            "plan": plan, "i": 0, "local": local, "from_ids": from_ids,
            "first": None,
        }
        req.slot = slot
        self.slots[slot] = req  # reserved; excluded from decode until installed

    def drain_admission(self) -> None:
        """Run any in-flight staged admission to completion (used by TTFT
        benchmarks and tests that time admission in isolation; ``step``
        interleaves instead)."""
        while self._adm is not None:
            self._advance_admission(len(self._adm["plan"]))

    def _advance_admission(self, max_chunks: int):
        """Run up to ``max_chunks`` pending prefill chunks; on completion,
        install the local cache into the slot and activate it."""
        adm = self._adm
        n = len(adm["plan"])
        while adm["i"] < n and max_chunks > 0:
            i = adm["i"]
            first = self._run_chunk(adm, i, need_logits=(i == n - 1))
            if i == n - 1:
                adm["first"] = first
            adm["i"] += 1
            max_chunks -= 1
        if adm["i"] < n:
            return
        slot = adm["slot"]
        self.cache, self.tokens, self.pos = _install_local(
            self.cache, adm["local"], jnp.int32(slot), self.tokens, self.pos,
            adm["first"], jnp.int32(adm["base"] + adm["t"]),
            layout=self.cache_layout,
        )
        self.pos_host[slot] = adm["base"] + adm["t"]
        self._pending_first[slot] = True
        if self.spec_k:
            self._seed_slot_history(adm["req"], slot)
        self._adm = None

    def _admission_input(self, req: Request):
        """(array, prompt_len, from_ids) for admission: float embeddings, or
        int32 ids to embed device-side (see :meth:`add_request`)."""
        if req.prompt_embeds is not None:
            return req.prompt_embeds, req.prompt_embeds.shape[1], False
        ids = np.asarray(req.prompt_ids)
        if ids.ndim == 1:
            ids = ids[None, :]
        return ids.astype(np.int32), ids.shape[1], True

    def _admit(self):
        """Prefill queued prompts into free slots — zero host round-trips.

        Each admission is ONE fused dispatch (prefill + cache splice + first
        token recorded device-side); the first token reaches the host via the
        next ``step``'s single token-matrix fetch (its column 0)."""
        for slot in range(self.max_batch):
            if self.slots[slot] is not None or not self.queue:
                continue
            req = self.queue.popleft()
            arr, t, from_ids = self._admission_input(req)
            if t > self.buckets[-1]:
                # long prompt: chunked admission; with prefix_id the local
                # cache seeds from the cached prefix and chunks start at
                # pos = prefix_len
                plen = self._prefixes[req.prefix_id][1] if req.prefix_id is not None else 0
                if plen + t + 1 > self.max_len:
                    raise ValueError(
                        f"prompt length {t} (+ prefix {plen}) needs at least "
                        f"{plen + t + 1} cache slots, max_len={self.max_len}"
                    )
                if self._adm is not None:
                    # one staged admission at a time: keep FIFO order and
                    # retry next step
                    self.queue.appendleft(req)
                    break
                self._start_chunked_admission(req, slot)
                continue
            b = self._bucket(t)
            emb = arr
            if b > t:
                # pad on the HOST: a device-side pad (or any traced op on the
                # raw prompt) compiles once per distinct prompt LENGTH —
                # unbounded compile-cache growth, and each compile costs
                # hundreds of ms. Host padding keeps compiles bounded by the
                # bucket set; producers can also pre-pad to a bucket size.
                emb = np.asarray(emb)
                pad = ((0, 0), (0, b - t)) + (((0, 0),) if emb.ndim == 3 else ())
                emb = np.pad(emb, pad)
            emb = jnp.asarray(emb)
            if req.prefix_id is not None:
                blocks, plen, pbucket = self._prefixes[req.prefix_id]
                if pbucket + b > self.max_len:
                    raise ValueError(
                        f"prefix bucket {pbucket} + suffix bucket {b} exceeds "
                        f"max_len {self.max_len}"
                    )
                self.cache, self.tokens, self.pos = _prefill_suffix_into(
                    self.prefill_params, self.config, self.prefill_specs, emb, blocks,
                    self.cache, jnp.int32(slot), self.tokens, self.pos,
                    jnp.int32(plen), jnp.int32(t), pbucket=pbucket, sbucket=b,
                    cache_dtype=self.cache_dtype, tp=self.tp,
                    layout=self.cache_layout, from_ids=from_ids,
                )
                self.pos_host[slot] = plen + t
            else:
                self.cache, self.tokens, self.pos = _prefill_into(
                    self.prefill_params, self.config, self.prefill_specs, emb, self.cache,
                    jnp.int32(slot), self.tokens, self.pos, jnp.int32(t), bucket=b,
                    cache_dtype=self.cache_dtype, tp=self.tp,
                    layout=self.cache_layout, from_ids=from_ids,
                )
                self.pos_host[slot] = t
            req.slot = slot
            self.slots[slot] = req
            self._pending_first[slot] = True
            if self.spec_k:
                self._seed_slot_history(req, slot)

    def _seed_slot_history(self, req: Request, slot: int):
        """Seed a slot's speculation history: prompt ids (when the caller
        provided them — spliced image embeds have none) + the prefill's
        first token (still device-side)."""
        if req.prompt_ids is not None:
            ids = np.asarray(req.prompt_ids, np.int32).reshape(-1)
        else:
            ids = np.zeros((0,), np.int32)
        self._seed_history_ids(slot, ids, self.tokens[slot])
        self._spec_miss[slot] = 0
        self._spec_pause[slot] = 0

    def _seed_history_ids(self, slot: int, ids: np.ndarray, first_token):
        """Write ``[ids | first_token]`` into a slot's history row (ids may
        be empty; ``first_token`` is a host int or a device scalar)."""
        n_ids = len(ids)
        if n_ids == 0:
            ids_dev = jnp.zeros((1,), jnp.int32)
        else:
            if n_ids <= self.buckets[-1]:
                pb = self._bucket(n_ids)  # pad to a bucket: bounded compiles
            else:
                pb = self.max_len  # long history: one extra shape, bounded
            ids_dev = jnp.asarray(np.pad(ids, (0, pb - n_ids)))
        self.history, self.hist_len = _seed_history(
            self.history, self.hist_len, jnp.int32(slot), ids_dev,
            jnp.int32(n_ids), jnp.asarray(first_token, jnp.int32),
        )

    def _respec_slot(self, req: Request, slot: int):
        """Refresh a paused slot's history from the host token log before a
        speculation retry (histories go stale while the slot rides plain
        decode; a retry on a stale tail would be biased to miss again)."""
        ids = []
        if req.prompt_ids is not None:
            ids = list(np.asarray(req.prompt_ids, np.int32).reshape(-1))
        ids = ids + req.tokens
        if not ids:
            return
        self._seed_history_ids(slot, np.asarray(ids[:-1], np.int32), ids[-1])

    def _spec_update(self, per_slot):
        """Adaptive-speculation accounting after a spec iteration/burst.
        ``per_slot``: list of (verifies_run, proposals_accepted) per slot.
        ``spec_miss_limit`` consecutive zero-accept verifies pause a slot
        for ``spec_retry_period`` iterations."""
        for slot, (verifies, accepted) in enumerate(per_slot):
            if self.slots[slot] is None or self._spec_pause[slot] > 0 or verifies == 0:
                continue
            if accepted > 0:
                self._spec_miss[slot] = 0
            else:
                self._spec_miss[slot] += verifies
                if self._spec_miss[slot] >= self.spec_miss_limit:
                    self._spec_pause[slot] = self.spec_retry_period
                    self._spec_miss[slot] = 0

    def _finish(self, req: Request):
        req.done = True
        req.finish_time = time.perf_counter()
        if req.slot >= 0 and self.slots[req.slot] is req:
            self.slots[req.slot] = None
        req.slot = -1
        self.completed.append(req)

    def step(self):
        """One engine iteration: admit new work, then one batched decode
        (``burst`` fused steps when safe — amortizes the host round-trip).

        Exactly ONE device→host fetch per iteration (the token matrix);
        per-slot positions are mirrored on the host (``pos_host``) by
        replaying the device's advance rule, so no position fetch is needed —
        host round-trips cost ~10-35 ms on remote-attached TPUs and would
        otherwise dominate the decode itself.

        Long-prompt admissions are STAGED: when other slots are actively
        decoding, only ``adm_chunks_per_step`` prefill chunks run per
        iteration, interleaved with the decode burst — an 8k admission no
        longer freezes active slots for its full prefill.  With no other
        active slot the admission drains in one iteration (staging would
        only add per-step overhead)."""
        self._admit()
        adm_slot = self._adm["slot"] if self._adm is not None else None
        if self._adm is not None:
            others = any(
                s is not None and i != adm_slot for i, s in enumerate(self.slots)
            )
            self._advance_admission(
                self.adm_chunks_per_step if others else len(self._adm["plan"])
            )
            if self._adm is None:
                adm_slot = None  # installed this iteration; slot decodes now
        active_list = [
            s is not None and i != adm_slot for i, s in enumerate(self.slots)
        ]
        if not any(active_list):
            return
        active = jnp.asarray(active_list)
        self.key, sub = jax.random.split(self.key)

        max_active_pos = max(
            (self.pos_host[i] for i, a in enumerate(active_list) if a), default=0
        )
        b = self.max_batch
        # per-slot results of this iteration (host side):
        #   entry_host (B,)      — the slot's entry token (prefill's first
        #                          token for freshly admitted slots)
        #   sampled_by_slot      — device-sampled token stream per slot
        #   adv_by_slot or None  — device pos advance per slot (None = derive
        #                          from the eos scan, plain-decode semantics)
        adv_by_slot = None
        n_steps = min(self.burst, self.max_len - 1 - max_active_pos)
        eos_ids = jnp.asarray(
            [r.eos_id if r is not None else -2 for r in self.slots], jnp.int32
        )
        # Adaptive speculation gating: decrement pauses, re-seed retrying
        # slots, and decide whether ANY active slot is spec-eligible this
        # iteration — when none is, plain decode serves the iteration (the
        # always-miss regime pays one verify window per retry period, not
        # one per step).
        spec_on = False
        if self.spec_k:
            for slot, r in enumerate(self.slots):
                if r is None:
                    continue
                if self._spec_pause[slot] > 0:
                    self._spec_pause[slot] -= 1
                    if self._spec_pause[slot] == 0:
                        self._respec_slot(r, slot)
                        spec_on = True
                else:
                    spec_on = True
        # When the verify window no longer fits the cache the engine falls
        # back to plain decode for the iteration; histories go stale, which
        # only degrades PROPOSALS (verification keeps output lossless).
        if (
            spec_on
            and max_active_pos + self.spec_k + 1 < self.max_len
        ):
            # fused spec burst: each iteration may emit up to k+1 tokens, so
            # size the burst for the all-accept worst case
            spec_steps = min(
                self.burst,
                max((self.max_len - 1 - max_active_pos) // (self.spec_k + 1), 1),
            )
            if spec_steps > 1:
                (
                    toks_seq, nvalid_seq, self.cache, self.pos,
                    self.history, self.hist_len, self.tokens,
                ) = _spec_decode_burst(
                    self.params, self.config, self.specs, self.cache,
                    self.tokens, self.pos, self.history, self.hist_len,
                    active, eos_ids,
                    k=self.spec_k, n=self.spec_n, n_steps=spec_steps, tp=self.tp,
                )
                toks_seq = np.asarray(toks_seq)  # (S, B, k+2)
                nv = np.asarray(nvalid_seq)  # (S, B)
                self.stats["spec_verify_steps"] += int((nv > 0).sum())
                self.stats["spec_accepted"] += int((nv[nv > 0] - 1).sum())
                entry_host = toks_seq[0, :, 0]
                sampled_by_slot = [
                    np.concatenate(
                        [toks_seq[s, i, 1 : 1 + nv[s, i]] for s in range(len(nv))]
                    )
                    for i in range(b)
                ]
                adv_by_slot = nv.sum(axis=0).tolist()
                self._spec_update(
                    [(int((nv[:, i] > 0).sum()), int((nv[nv[:, i] > 0, i] - 1).sum()))
                     for i in range(b)]
                )
            else:
                (
                    toks, nvalid, self.cache, self.pos,
                    self.history, self.hist_len, self.tokens,
                ) = _spec_decode_step(
                    self.params, self.config, self.specs, self.cache,
                    self.tokens, self.pos, self.history, self.hist_len, active,
                    k=self.spec_k, n=self.spec_n, tp=self.tp,
                )
                toks_host = np.asarray(toks)  # (B, k+2); col 0 = entry
                nvalid_host = np.asarray(nvalid)
                self.stats["spec_verify_steps"] += int((nvalid_host > 0).sum())
                self.stats["spec_accepted"] += int(
                    (nvalid_host[nvalid_host > 0] - 1).sum()
                )
                entry_host = toks_host[:, 0]
                sampled_by_slot = [
                    toks_host[i, 1 : 1 + nvalid_host[i]] for i in range(b)
                ]
                # spec mode advances the device pos by nvalid UNCONDITIONALLY
                # (rows that hit eos are freed and re-prefilled, so the stale
                # advance never matters — but the host mirror must match)
                adv_by_slot = nvalid_host.tolist()
                self._spec_update(
                    [(1 if nvalid_host[i] > 0 else 0, max(int(nvalid_host[i]) - 1, 0))
                     for i in range(b)]
                )
        elif n_steps > 1:
            toks, self.cache, self.pos = _decode_burst(
                self.params, self.config, self.specs, self.cache,
                self.tokens, self.pos, sub, self.temperature, active, eos_ids,
                n_steps=n_steps, tp=self.tp,
            )
            self.tokens = toks[:, -1]
            toks_host = np.asarray(toks)  # (B, 1 + n_steps); col 0 = entry
            entry_host = toks_host[:, 0]
            sampled_by_slot = [toks_host[i, 1:] for i in range(b)]
        else:
            entry = self.tokens
            nxt, self.cache, self.pos = _decode_step(
                self.params, self.config, self.specs, self.cache,
                self.tokens, self.pos, sub, self.temperature, active, tp=self.tp,
            )
            self.tokens = nxt
            toks_host = np.asarray(jnp.stack([entry, nxt], axis=1))
            entry_host = toks_host[:, 0]
            sampled_by_slot = [toks_host[i, 1:] for i in range(b)]

        for slot, req in enumerate(self.slots):
            if req is None or slot == adm_slot:
                # adm_slot: admission still in flight — the slot is reserved
                # but did not decode this iteration (its token row is stale)
                continue
            # the entry token: the prefill's first token if freshly admitted
            # (report it), else the already-reported last token
            first_pending = self._pending_first[slot]
            self._pending_first[slot] = False
            if first_pending:
                tok0 = int(entry_host[slot])
                req.tokens.append(tok0)
                if req.on_token is not None:
                    req.on_token(tok0, req)
                if tok0 == req.eos_id or len(req.tokens) >= req.max_new_tokens:
                    self._finish(req)
            # mirror the device pos rule over the SAMPLED tokens: pos
            # advances each step until (and including) the first eos; in
            # spec mode the device advance is the accepted count directly
            sampled = sampled_by_slot[slot]
            if adv_by_slot is not None:
                adv = adv_by_slot[slot]
            else:
                adv = len(sampled)
                for k in range(len(sampled)):
                    if int(sampled[k]) == req.eos_id:
                        adv = k + 1
                        break
            self.pos_host[slot] += adv
            if req.done:
                continue
            for k in range(len(sampled)):
                tok = int(sampled[k])
                req.tokens.append(tok)
                if req.on_token is not None:
                    req.on_token(tok, req)
                if tok == req.eos_id or len(req.tokens) >= req.max_new_tokens:
                    self._finish(req)
                    break
            if not req.done and self.pos_host[slot] >= self.max_len - 1:
                self._finish(req)
