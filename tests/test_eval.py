"""Accuracy-eval harness + an end-to-end QAT recovery demo: ternary QAT on an
overfit task must recover most of the quantization-induced loss (the
framework-level version of the reference's whole purpose)."""

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.eval.perplexity import compare_quantization, evaluate_loss
from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.quant.quantize import QuantConfig, quantize_decoder_params
from ternary_vllm_tpu.train.qat import TrainConfig, make_optimizer, make_train_step

CFG = phi.TINY_PHI_CONFIG


def _batches(n=3, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)))
        out.append({"input_ids": ids, "labels": ids})
    return out


def test_evaluate_loss_runs():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    loss = evaluate_loss(params, CFG, phi.layer_specs(CFG), _batches())
    assert np.isfinite(loss) and loss > 0


def test_compare_quantization_reports_delta():
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    rep = compare_quantization(params, CFG, _batches(), QuantConfig())
    assert set(rep) >= {"fp_loss", "quant_loss", "delta", "rel_ppl_increase"}
    assert np.isfinite(rep["delta"])


def test_qat_recovers_quantization_loss():
    """Overfit a dense model on a fixed batch, quantize (loss jumps), then QAT
    fine-tune: the quantized loss must come back down substantially — the
    end-to-end QAT capability gate."""
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    batch = _batches(1, seed=7)[0]

    # 1. train dense to low loss
    tc_d = TrainConfig(lr=0.2, total_steps=60, quantization="none")
    tx_d = make_optimizer(tc_d)
    specs_d = phi.layer_specs(CFG)
    step_d = make_train_step(CFG, specs_d, tc_d, tx_d)
    p, s = params, tx_d.init(params)
    for _ in range(40):
        p, s, m = step_d(p, s, batch)
    dense_loss = float(m["loss"])

    # 2. quantize ternary -> loss degrades
    qat_params, qspecs = quantize_decoder_params(p, CFG, QuantConfig())
    q0 = evaluate_loss(qat_params, CFG, qspecs, [batch])
    assert q0 > dense_loss

    # 3. QAT fine-tune recovers
    tc_q = TrainConfig(lr=0.05, total_steps=80, quantization="ternary")
    tx_q = make_optimizer(tc_q)
    step_q = make_train_step(CFG, qspecs, tc_q, tx_q)
    pq, sq = qat_params, tx_q.init(qat_params)
    for _ in range(60):
        pq, sq, mq = step_q(pq, sq, batch)
    q1 = evaluate_loss(pq, CFG, qspecs, [batch])
    assert q1 < q0, (q0, q1)
    # recovered a large share of the gap
    assert (q0 - q1) / max(q0 - dense_loss, 1e-6) > 0.5, (dense_loss, q0, q1)


def test_corpus_token_batches_npy(tmp_path):
    from ternary_vllm_tpu.eval.perplexity import corpus_token_batches

    ids = np.arange(1000) % 50
    np.save(tmp_path / "c.npy", ids)
    batches = corpus_token_batches(
        str(tmp_path / "c.npy"), vocab_size=64, seq_len=128, batch_size=2
    )
    total = sum(int(b["input_ids"].size) for b in batches)
    assert total == (1000 // 128) * 128
    assert all(b["input_ids"].shape[1] == 128 for b in batches)
    flat = np.concatenate([np.asarray(b["input_ids"]).reshape(-1) for b in batches])
    np.testing.assert_array_equal(flat, ids[: len(flat)])


def test_corpus_token_batches_text_byte_fallback(tmp_path):
    from ternary_vllm_tpu.eval.perplexity import corpus_token_batches

    (tmp_path / "c.txt").write_text("hello world, " * 100)
    batches = corpus_token_batches(
        str(tmp_path / "c.txt"), vocab_size=300, seq_len=64, batch_size=4
    )
    assert batches and all(int(b["input_ids"].max()) < 256 for b in batches)


def test_corpus_token_batches_too_small_raises(tmp_path):
    import pytest

    from ternary_vllm_tpu.eval.perplexity import corpus_token_batches

    (tmp_path / "tiny.txt").write_text("abc")
    with pytest.raises(ValueError, match="full window"):
        corpus_token_batches(str(tmp_path / "tiny.txt"), seq_len=64)


def test_eval_cli_text_file(tmp_path, capsys):
    from ternary_vllm_tpu.cli.eval import main

    (tmp_path / "corpus.txt").write_text("the quick brown fox " * 50)
    main([
        "--tiny", "--text-file", str(tmp_path / "corpus.txt"),
        "--seq-len", "32", "--batch-size", "4",
    ])
    out = capsys.readouterr().out
    assert "corpus:" in out
    assert "rel_ppl_increase" in out
