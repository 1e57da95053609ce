"""Pipeline parallelism: pipelined forward/grads == single-device forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipeline_forward,
    pipeline_loss_fn,
    shard_pipeline_params,
    stack_layer_params,
    unstack_layer_params,
)

CFG = phi.PhiConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=64,
)


def _setup(quant=False):
    params = phi.init_phi_params(jax.random.PRNGKey(0), CFG)
    if quant:
        from ternary_vllm_tpu.quant.quantize import QuantConfig, quantize_decoder_params

        params, specs = quantize_decoder_params(params, CFG, QuantConfig(quantization="ternary"))
    else:
        specs = phi.layer_specs(CFG)
    return params, specs


def test_stack_roundtrip():
    params, _ = _setup()
    back = unstack_layer_params(stack_layer_params(params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("quant", [False, True])
def test_pipeline_forward_matches_plain(quant):
    params, specs = _setup(quant)
    mesh = make_pipe_mesh(4, jax.devices("cpu")[:4])
    emb = jax.random.normal(jax.random.PRNGKey(1), (4, 8, CFG.hidden_size), jnp.float32)

    ref, _ = phi.forward(params, CFG, phi.freeze_specs(specs), emb)
    stacked = shard_pipeline_params(stack_layer_params(params), mesh)
    got, _ = pipeline_forward(params=stacked, config=CFG, specs=specs,
                              inputs_embeds=emb, mesh=mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pipeline_respects_padding_mask():
    params, specs = _setup()
    mesh = make_pipe_mesh(4, jax.devices("cpu")[:4])
    emb = jax.random.normal(jax.random.PRNGKey(2), (4, 8, CFG.hidden_size), jnp.float32)
    mask = jnp.asarray(np.random.default_rng(0).integers(0, 2, (4, 8)), bool).at[:, 0].set(True)

    ref, _ = phi.forward(params, CFG, phi.freeze_specs(specs), emb, attn_mask=mask)
    stacked = shard_pipeline_params(stack_layer_params(params), mesh)
    got, _ = pipeline_forward(params=stacked, config=CFG, specs=specs,
                              inputs_embeds=emb, mesh=mesh, microbatches=2, attn_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pipeline_grads_match_plain():
    params, specs = _setup(quant=True)
    mesh = make_pipe_mesh(2, jax.devices("cpu")[:2])
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)))
    batch = {"input_ids": ids, "labels": ids}

    def plain_loss(p):
        logits, _ = phi.forward_tokens(p, CFG, phi.freeze_specs(specs), batch["input_ids"])
        labels = batch["labels"][:, 1:]
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    ref_loss = plain_loss(params)
    ref_grads = jax.grad(plain_loss)(params)

    stacked = shard_pipeline_params(stack_layer_params(params), mesh)

    def pipe_loss(p):
        return pipeline_loss_fn(p, CFG, specs, mesh, batch, microbatches=2)

    got_loss = pipe_loss(stacked)
    got_grads = unstack_layer_params(jax.grad(pipe_loss)(stacked))
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-4)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_grads),
        jax.tree_util.tree_leaves_with_path(got_grads),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4,
            err_msg=f"{jax.tree_util.keystr(ka)}",
        )
