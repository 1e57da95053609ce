"""Vision tower + VLM composition: shapes, quantized tower, splice layouts,
frozen-vision gradients (reference ``train.py:157-162``,
``test_tflite.py:104-127``)."""

import jax
import jax.numpy as jnp
import numpy as np

from ternary_vllm_tpu.models import phi, vision, vlm

VC = vision.TINY_VISION_CONFIG
CFG = vlm.TINY_VLM_CONFIG


def test_patchify_roundtrip_order():
    # 2x2 grid of 14x14 patches; check row-major order and content
    img = np.zeros((1, 28, 28, 3), np.float32)
    img[0, 0:14, 14:28, :] = 1.0  # patch (row 0, col 1)
    patches = np.asarray(vision.patchify(jnp.asarray(img), 14))
    assert patches.shape == (1, 4, 14 * 14 * 3)
    assert patches[0, 1].sum() == 14 * 14 * 3
    assert patches[0, 0].sum() == 0


def test_encode_image_shapes():
    params = vision.init_vision_params(jax.random.PRNGKey(0), VC)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 28, 28, 3)), jnp.float32)
    feats = vision.encode_image(params, VC, imgs)
    assert feats.shape == (2, VC.num_patches, VC.hidden_size)
    embs = vision.image_embeddings(params, VC, imgs)
    assert embs.shape == (2, VC.num_patches, VC.proj_out_size)
    assert bool(jnp.all(jnp.isfinite(embs)))


def test_quantized_vision_tower():
    from ternary_vllm_tpu.models.phi import LinearSpec

    params = vision.init_vision_params(jax.random.PRNGKey(0), VC)
    qspec = LinearSpec(kind="qat", mode="ternary")
    # calibrate each block linear so qat forward is sane
    from ternary_vllm_tpu.quant.calibrate import calibrate_ternary

    for layer in params["layers"]:
        for name in vision.VIT_QUANT_LINEARS:
            latent, scale = calibrate_ternary(layer[name]["w"])
            layer[name] = {"latent": latent, "scale": scale, "b": layer[name]["b"]}
    specs = vision.vit_layer_specs(VC, quant=qspec)
    imgs = jnp.asarray(np.random.default_rng(1).normal(size=(1, 28, 28, 3)), jnp.float32)
    feats = vision.encode_image(params, VC, imgs, specs)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_vlm_forward_and_splice():
    params = vlm.init_vlm_params(jax.random.PRNGKey(0), CFG)
    specs = phi.layer_specs(CFG.text)
    imgs = jnp.asarray(np.random.default_rng(2).normal(size=(2, 28, 28, 3)), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, CFG.text.vocab_size, (2, 6)))
    logits = vlm.vlm_forward(params, CFG, specs, imgs, ids)
    n_img = CFG.vision.num_patches
    assert logits.shape == (2, 1 + n_img + 5, CFG.text.vocab_size)


def test_vision_gradient_frozen():
    params = vlm.init_vlm_params(jax.random.PRNGKey(0), CFG)
    specs = phi.layer_specs(CFG.text)
    imgs = jnp.ones((1, 28, 28, 3), jnp.float32)
    ids = jnp.asarray([[1, 2, 3]])

    def loss(p):
        logits = vlm.vlm_forward(p, CFG, specs, imgs, ids, stop_vision_gradient=True)
        return jnp.sum(logits**2) * 1e-6

    grads = jax.grad(loss)(params)
    vis_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["vision"])
    )
    txt_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["text"])
    )
    assert vis_norm == 0.0
    assert txt_norm > 0.0


def test_splice_prompt_layout():
    params = vlm.init_vlm_params(jax.random.PRNGKey(0), CFG)
    img_embs = jnp.ones((1, 4, CFG.text.hidden_size))
    before = jnp.asarray([[7, 8]])
    after = jnp.asarray([[9]])
    out = vlm.splice_prompt(params, img_embs, before, after, bos_id=1)
    assert out.shape == (1, 1 + 2 + 4 + 1, CFG.text.hidden_size)
    # image block is where we put it
    np.testing.assert_allclose(np.asarray(out[0, 3:7]), np.ones((4, CFG.text.hidden_size)))
