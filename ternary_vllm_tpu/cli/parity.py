"""Real-weights parity + accuracy recipe (VERDICT r1 item 4).

Given a locally-downloaded HF Phi-architecture model (directory with
``config.json`` + safetensors — e.g. ``microsoft/phi-1_5`` or the moondream2
text model), this:

1. imports the weights into our pytree (``convert.torch_import``),
2. asserts full-logits MSE vs the torch forward on real token ids —
   the reference's conversion parity check (``utils/conversion.py:144-145,
   236-239``), printed there, ASSERTED here,
3. asserts token-exact greedy continuation vs HF ``generate``,
4. runs the FP-vs-ternary-calibrated accuracy gate on real text
   (``eval.perplexity.compare_quantization``; BASELINE "≤1% accuracy drop"
   machinery — note post-calibration ppl before QAT recovery is expected to
   exceed 1% on real models; the gate value is configurable).

Usage:
    python -m ternary_vllm_tpu.cli.parity --model /path/to/phi-1_5 \
        [--text-file sample.txt] [--mse-gate 1e-6] [--ppl-gate 0.25]

No network access is needed or used; everything loads from disk.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from ternary_vllm_tpu.utils.scripting import get_var

DEFAULT_TEXT = (
    "The tensor processing unit was announced in 2016 as a custom "
    "accelerator for neural network inference. Quantization reduces the "
    "memory footprint of large language models by storing weights in fewer "
    "bits; ternary quantization keeps only the values minus one, zero and "
    "plus one, with a learned per-channel scale."
)


def load_hf_model(model_dir: str):
    """Local HF Phi-architecture model -> (torch model, tokenizer or None)."""
    import transformers

    model = transformers.AutoModelForCausalLM.from_pretrained(
        model_dir, torch_dtype="float32", local_files_only=True
    )
    model.eval()
    tok = None
    try:
        tok = transformers.AutoTokenizer.from_pretrained(
            model_dir, local_files_only=True
        )
    except Exception:
        pass
    return model, tok


def real_tokens(tok, text: str, fallback_vocab: int, n: int = 64) -> np.ndarray:
    if tok is not None:
        ids = tok(text, return_tensors="np")["input_ids"][:, :n]
        if ids.shape[1] >= 8:
            return ids.astype(np.int64)
    return np.random.default_rng(0).integers(0, fallback_vocab, (1, n))


def check_parity(model, ids: np.ndarray, mse_gate: float = 1e-6) -> dict:
    """Torch-vs-JAX full-logits MSE + greedy-continuation equality."""
    import torch

    import jax.numpy as jnp

    from ternary_vllm_tpu.convert.torch_import import (
        params_from_state_dict,
        phi_config_from_hf,
    )
    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.serve.decode import Decoder

    config = phi_config_from_hf(model.config)
    params = params_from_state_dict(model.state_dict(), config)
    specs = phi.layer_specs(config)

    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.float().numpy()
    ours, _ = phi.forward_tokens(params, config, specs, jnp.asarray(ids))
    ours = np.asarray(ours, np.float32)
    mse = float(((ours - ref) ** 2).mean())
    rel = mse / float((ref**2).mean() + 1e-12)

    with torch.no_grad():
        hf_cont = model.generate(
            torch.from_numpy(ids[:1, :16]), max_new_tokens=8, do_sample=False,
            pad_token_id=0,
        ).numpy()[0, 16:]
    dec = Decoder(params, config, specs, max_len=64, cache_dtype=jnp.float32)
    emb = phi.embed_tokens(params, jnp.asarray(ids[:1, :16])).astype(jnp.float32)
    tokens, _, _ = dec.generate(emb, max_new_tokens=8)
    greedy_match = bool(np.array_equal(np.asarray(tokens)[0], hf_cont))

    report = {
        "logits_mse": mse,
        "logits_rel_mse": rel,
        "greedy_match": greedy_match,
        "config": {"layers": config.num_hidden_layers, "hidden": config.hidden_size},
    }
    if mse_gate is not None:
        assert rel < mse_gate, f"relative logits MSE {rel} exceeds gate {mse_gate}"
        assert greedy_match, "greedy continuation diverged from HF generate"
    return report, params, config


def accuracy_gate(params, config, batches: list, ppl_gate: Optional[float]) -> dict:
    """FP vs ternary-calibrated (packed) perplexity on real token batches."""
    from ternary_vllm_tpu.eval.perplexity import compare_quantization

    rep = compare_quantization(params, config, batches)
    if ppl_gate is not None:
        assert rep["rel_ppl_increase"] < ppl_gate, (
            f"calibrated ternary ppl increase {rep['rel_ppl_increase']:.4f} "
            f"exceeds gate {ppl_gate} (QAT recovery training required?)"
        )
    return rep


def main(argv=None):
    p = argparse.ArgumentParser(description="real-weights parity + accuracy gate")
    p.add_argument("--model", required=True, help="local HF model directory")
    p.add_argument("--text-file", default=None,
                   help="corpus for the accuracy gate (.txt tokenized with "
                        "the model's tokenizer, or .npy/.npz token stream); "
                        "the gate then runs over ALL --gate-seq-len windows "
                        "(supply >=50k tokens for a trustworthy gate) while "
                        "the torch-parity check keeps its --n-tokens snippet")
    p.add_argument("--gate-seq-len", type=int, default=512)
    p.add_argument("--gate-max-tokens", type=int, default=None)
    p.add_argument("--n-tokens", type=int, default=64)
    p.add_argument("--mse-gate", type=float, default=1e-6,
                   help="relative logits-MSE gate vs torch (None disables)")
    p.add_argument("--ppl-gate", type=float, default=None,
                   help="optional relative ppl-increase gate for calibrated "
                        "ternary (e.g. 0.25; omit to report only)")
    args = p.parse_args(argv)
    for name in vars(args):
        setattr(args, name, get_var(name, args))

    model, tok = load_hf_model(args.model)
    text = DEFAULT_TEXT
    if args.text_file and not args.text_file.endswith((".npy", ".npz")):
        with open(args.text_file) as f:
            text = f.read()
    ids = real_tokens(tok, text, model.config.vocab_size, args.n_tokens)
    report, params, config = check_parity(model, ids, args.mse_gate)
    print("parity:", json.dumps(report))

    if args.text_file:
        # full-corpus gate: every --gate-seq-len window of the supplied text
        from ternary_vllm_tpu.eval.perplexity import corpus_token_batches

        batches = corpus_token_batches(
            args.text_file, tokenizer=tok, vocab_size=config.vocab_size,
            seq_len=args.gate_seq_len, max_tokens=args.gate_max_tokens,
        )
        n_tok = sum(int(np.asarray(b["input_ids"]).size) for b in batches)
        print(f"accuracy gate corpus: {n_tok} tokens "
              f"({len(batches)} batches of seq_len {args.gate_seq_len})")
    else:
        batches = [{"input_ids": ids, "labels": ids}]  # 64-token fallback
    acc = accuracy_gate(params, config, batches, args.ppl_gate)
    print("accuracy:", json.dumps({k: float(v) for k, v in acc.items()}))


if __name__ == "__main__":
    main()
