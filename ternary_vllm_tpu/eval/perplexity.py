"""Accuracy evaluation: loss / perplexity and FP-vs-quantized deltas.

The reference never measures accuracy in-repo (train/val loss + qualitative
samples only, SURVEY.md §6); the BASELINE gate is "≤1% accuracy drop vs the
reference ternary checkpoint at the same bit-width".  This module is that
gate's machinery: batched CE/perplexity evaluation and a one-call
FP-vs-quantized comparison over any token stream.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.train.qat import cross_entropy_loss


def corpus_token_batches(
    source: str,
    *,
    tokenizer=None,
    vocab_size: Optional[int] = None,
    seq_len: int = 512,
    batch_size: int = 4,
    max_tokens: Optional[int] = None,
) -> list:
    """Token batches from a corpus file — the accuracy gate's data loader
    (VERDICT r2 item 8: the gate must be able to run over >=50k real tokens,
    not just a 64-token snippet).

    ``source`` is either a token array (``.npy``/``.npz`` int array, flattened)
    or a text file.  Text is tokenized with ``tokenizer`` (an HF tokenizer)
    when given; otherwise a byte-level fallback maps UTF-8 bytes to ids < 256
    — deterministic and vocab-safe, but smoke-quality only (real gates should
    pass the checkpoint's tokenizer).

    The stream is cut into ``floor(n / seq_len)`` non-overlapping windows of
    ``seq_len`` tokens (causal LM: labels = input_ids, HF shift semantics),
    grouped ``batch_size`` windows per batch.  ``max_tokens`` truncates the
    stream first."""
    pre_tokenized = source.endswith((".npy", ".npz"))
    if pre_tokenized:
        arr = np.load(source)
        if hasattr(arr, "files"):  # npz: first array
            arr = arr[arr.files[0]]
        ids = np.asarray(arr).reshape(-1).astype(np.int32)
    else:
        with open(source, "rb") as f:
            raw = f.read()
        if tokenizer is not None:
            ids = np.asarray(
                tokenizer(raw.decode("utf-8", errors="replace"))["input_ids"],
                np.int32,
            ).reshape(-1)
        else:
            ids = np.frombuffer(raw, np.uint8).astype(np.int32)
    if max_tokens is not None:
        ids = ids[:max_tokens]
    if vocab_size is not None:
        if tokenizer is None and not pre_tokenized:
            ids = ids % vocab_size  # byte fallback is always < 256 anyway
        elif int(ids.max(initial=0)) >= vocab_size:
            # pre-tokenized arrays and tokenizer output must already be
            # in-vocab — silently wrapping out-of-vocab ids (mismatched
            # tokenizer/corpus) would quietly skew the accuracy gate
            raise ValueError(
                f"corpus token id {int(ids.max())} >= model vocab {vocab_size}"
            )
    n_windows = len(ids) // seq_len
    if n_windows == 0:
        raise ValueError(
            f"corpus has {len(ids)} tokens < seq_len {seq_len}; need at least "
            "one full window"
        )
    windows = ids[: n_windows * seq_len].reshape(n_windows, seq_len)
    batches = []
    for i in range(0, n_windows, batch_size):
        chunk = jnp.asarray(windows[i : i + batch_size])
        batches.append({"input_ids": chunk, "labels": chunk})
    return batches


def evaluate_loss(params, config, specs, batches: Iterable[dict]) -> float:
    """Mean causal-LM loss over batches of {input_ids | inputs_embeds, labels,
    [attn_mask]} (HF shift semantics, −100 ignored)."""
    frozen = phi.freeze_specs(specs)

    @jax.jit
    def batch_loss(params, batch):
        if "inputs_embeds" in batch:
            embeds = batch["inputs_embeds"]
        else:
            embeds = phi.embed_tokens(params, batch["input_ids"])
        logits, _ = phi.forward(
            params, config, frozen, embeds, None, 0, batch.get("attn_mask")
        )
        return cross_entropy_loss(logits, batch["labels"])

    losses = [float(batch_loss(params, b)) for b in batches]
    if not losses:
        raise ValueError("no evaluation batches")
    return float(np.mean(losses))


def evaluate_perplexity(params, config, specs, batches: Iterable[dict]) -> float:
    return float(np.exp(evaluate_loss(params, config, specs, batches)))


def compare_quantization(
    dense_params,
    config,
    batches: list,
    qc=None,
    packed: bool = True,
    a8: bool = False,
    int8_head: bool = False,
    head_fmt: str = None,
) -> Dict[str, float]:
    """FP baseline vs calibrated-quantized (optionally packed) on the same
    data.  Returns {fp_loss, quant_loss, delta, fp_ppl, quant_ppl,
    rel_ppl_increase}.  ``a8`` additionally quantizes activations to int8
    (the w2a8 kernel path); ``int8_head``/``head_fmt`` quantizes the lm_head
    (``"q8"`` = w8a8, ``"q4"`` = planar-int4 w4a8) — so their extra
    quantization error shows up in the gate."""
    from ternary_vllm_tpu.quant.quantize import (
        QuantConfig,
        pack_decoder_params,
        quantize_decoder_params,
        quantize_lm_head_int4,
        quantize_lm_head_int8,
    )

    if head_fmt is None and int8_head:
        head_fmt = "q8"

    qc = qc or QuantConfig()
    dense_specs = phi.layer_specs(config)
    fp_loss = evaluate_loss(dense_params, config, dense_specs, batches)

    qat_params, qat_specs = quantize_decoder_params(dense_params, config, qc)
    if packed and qc.quantization != "smoothBinary":
        qat_params, qat_specs = pack_decoder_params(qat_params, qat_specs, k_multiple=4, a8=a8)
        if head_fmt == "q8":
            qat_params = quantize_lm_head_int8(qat_params)
        elif head_fmt == "q4":
            qat_params = quantize_lm_head_int4(qat_params)
        elif head_fmt is not None:
            raise ValueError(f"unknown head_fmt {head_fmt!r}; expected 'q8' or 'q4'")
    q_loss = evaluate_loss(qat_params, config, qat_specs, batches)

    fp_ppl, q_ppl = float(np.exp(fp_loss)), float(np.exp(q_loss))
    return {
        "fp_loss": fp_loss,
        "quant_loss": q_loss,
        "delta": q_loss - fp_loss,
        "fp_ppl": fp_ppl,
        "quant_ppl": q_ppl,
        "rel_ppl_increase": (q_ppl - fp_ppl) / fp_ppl,
    }
