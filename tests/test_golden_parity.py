"""Golden-parity vs HF transformers Phi — the reference's core test strategy
(reference ``utils/conversion.py:144-145,236-239``: per-block + full-model MSE
vs the trusted torch implementation), here with *asserted* tolerances instead
of printed ones."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from ternary_vllm_tpu.convert.torch_import import (  # noqa: E402
    params_from_state_dict,
    phi_config_from_hf,
)
from ternary_vllm_tpu.models import phi  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.PhiConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        partial_rotary_factor=0.5,
        max_position_embeddings=64,
        hidden_act="gelu_new",
    )
    torch.manual_seed(0)
    model = transformers.PhiForCausalLM(cfg)
    model.eval()
    return model


def test_logits_match_hf(hf_model):
    config = phi_config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), config)
    specs = phi.layer_specs(config)

    ids = np.random.default_rng(0).integers(0, config.vocab_size, (2, 11))
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()

    ours, _ = phi.forward_tokens(params, config, specs, jnp.asarray(ids))
    ours = np.asarray(ours)

    mse = float(((ours - ref) ** 2).mean())
    assert mse < 1e-8, f"logits MSE vs HF Phi too high: {mse}"
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_cached_decode_matches_hf_generate(hf_model):
    """Greedy continuation must agree token-for-token with HF generate."""
    config = phi_config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), config)
    specs = phi.layer_specs(config)

    prompt = np.asarray([[5, 9, 2, 7]])
    with torch.no_grad():
        ref_out = hf_model.generate(
            torch.from_numpy(prompt), max_new_tokens=6, do_sample=False,
            pad_token_id=0,
        ).numpy()[0, prompt.shape[1]:]

    from ternary_vllm_tpu.serve.decode import Decoder

    dec = Decoder(params, config, specs, max_len=64, cache_dtype=jnp.float32)
    emb = phi.embed_tokens(params, jnp.asarray(prompt)).astype(jnp.float32)
    tokens, n, _ = dec.generate(emb, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(tokens)[0], ref_out)
