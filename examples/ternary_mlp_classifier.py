"""BASELINE config 2: a ternary MLP classifier trained with QAT.

Demonstrates the framework's quantized-layer building blocks outside the Phi
stack: dense training -> absmean calibration -> latent/STE QAT recovery ->
pack -> packed inference, reporting the FP / post-calibration / QAT-recovered
accuracy triplet.

Data: real CIFAR-10 when the standard python pickle batches are on disk
(``--cifar DIR`` or env ``CIFAR10_DIR`` pointing at the directory holding
``data_batch_1..5`` + ``test_batch`` — this image has no network access, so
nothing is downloaded), otherwise a synthetic 2-class problem so the example
runs anywhere.

    python examples/ternary_mlp_classifier.py [--cifar /data/cifar-10-batches-py]
"""

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ternary_vllm_tpu.models.phi import LinearSpec, apply_linear
from ternary_vllm_tpu.ops.packing import pack_ternary
from ternary_vllm_tpu.ops.quantizers import tri_step_ste
from ternary_vllm_tpu.quant.calibrate import calibrate_ternary


def make_synthetic(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 64)).astype(np.float32)
    w_true = rng.normal(size=(64, 1)).astype(np.float32)
    y = ((np.tanh(x @ w_true) + 0.3 * np.sin(3 * x[:, :1])) > 0).astype(np.int32)[:, 0]
    split = int(n * 0.875)
    return (jnp.asarray(x[:split]), jnp.asarray(y[:split]),
            jnp.asarray(x[split:]), jnp.asarray(y[split:]), 2)


def load_cifar10(root):
    """Standard CIFAR-10 python pickle batches -> normalized flat features."""
    def batch(name):
        with open(os.path.join(root, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        return d[b"data"].astype(np.float32) / 255.0, np.asarray(d[b"labels"], np.int32)

    xs, ys = zip(*[batch(f"data_batch_{i}") for i in range(1, 6)])
    xt, yt = np.concatenate(xs), np.concatenate(ys)
    xv, yv = batch("test_batch")
    mu, sd = xt.mean(0, keepdims=True), xt.std(0, keepdims=True) + 1e-6
    return (jnp.asarray((xt - mu) / sd), jnp.asarray(yt),
            jnp.asarray((xv - mu) / sd), jnp.asarray(yv), 10)


QAT = LinearSpec(kind="qat", mode="ternary", clip_val=100.0)
PACKED = LinearSpec(kind="packed", mode="ternary", clip_val=100.0)


def init_dense(key, sizes):
    layers = []
    for i, (k, n) in enumerate(zip(sizes[:-1], sizes[1:])):
        kk = jax.random.fold_in(key, i)
        layers.append({"w": jax.random.normal(kk, (k, n)) * (1.0 / np.sqrt(k)),
                       "b": jnp.zeros((n,))})
    return layers


def forward(layers, specs, x):
    for i, (p, s) in enumerate(zip(layers, specs)):
        act = "relu" if i < len(layers) - 1 else None
        x = apply_linear(s, p, x, act=act)
    return x


def accuracy(layers, specs, x, y, batch=8192):
    correct = 0
    for s in range(0, x.shape[0], batch):
        logits = forward(layers, specs, x[s : s + batch])
        correct += int(jnp.sum(jnp.argmax(logits, axis=-1) == y[s : s + batch]))
    return correct / x.shape[0]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cifar", default=os.environ.get("CIFAR10_DIR"))
    p.add_argument("--steps", type=int, default=None)
    args = p.parse_args(argv)

    use_cifar = bool(args.cifar) and os.path.isdir(args.cifar)
    if use_cifar:
        xt, yt, xv, yv, n_cls = load_cifar10(args.cifar)
        sizes = [xt.shape[1], 512, 256, n_cls]
        steps = args.steps or 3000
        print(f"CIFAR-10: {xt.shape[0]} train / {xv.shape[0]} test")
    else:
        xt, yt, xv, yv, n_cls = make_synthetic()
        sizes = [xt.shape[1], 256, 256, n_cls]
        steps = args.steps or 300
        print("no CIFAR-10 on disk: synthetic 2-class data "
              "(--cifar DIR or CIFAR10_DIR for the real set)")

    n_lin = len(sizes) - 1
    dense_specs = [LinearSpec()] * n_lin
    qat_specs = [QAT] * n_lin
    bsz = 256
    n_train = (xt.shape[0] // bsz) * bsz

    def loss_fn(layers, specs, xb, yb):
        logits = forward(layers, specs, xb)
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, yb)
        )

    tx = optax.adam(1e-3)

    def make_step(specs, clip_latents):
        @jax.jit
        def step(layers, opt_state, xb, yb):
            loss, g = jax.value_and_grad(loss_fn)(layers, specs, xb, yb)
            updates, opt_state = tx.update(g, opt_state)
            layers = optax.apply_updates(layers, updates)
            if clip_latents:
                layers = [dict(p, latent=jnp.clip(p["latent"], -1, 1)) for p in layers]
            return layers, opt_state, loss

        return step

    # 1. train dense
    layers = init_dense(jax.random.PRNGKey(0), sizes)
    dense_step = make_step(dense_specs, clip_latents=False)
    st = tx.init(layers)
    for i in range(steps):
        j = (i * bsz) % n_train
        layers, st, loss = dense_step(layers, st, xt[j : j + bsz], yt[j : j + bsz])
    acc_dense = accuracy(layers, dense_specs, xv, yv)

    # 2. calibrate -> ternary QAT recovery
    qat_layers = []
    for p in layers:
        latent, scale = calibrate_ternary(p["w"])
        qat_layers.append({"latent": latent, "scale": scale, "b": p["b"]})
    acc_post_calib = accuracy(qat_layers, qat_specs, xv, yv)

    qat_step = make_step(qat_specs, clip_latents=True)
    st = tx.init(qat_layers)
    for i in range(steps):
        j = (i * bsz) % n_train
        qat_layers, st, loss = qat_step(qat_layers, st, xt[j : j + bsz], yt[j : j + bsz])
    acc_qat = accuracy(qat_layers, qat_specs, xv, yv)

    # 3. pack for inference
    packed_layers = [
        {"packed": pack_ternary(tri_step_ste(p["latent"])), "scale": p["scale"], "b": p["b"]}
        for p in qat_layers
    ]
    acc_packed = accuracy(packed_layers, [PACKED] * n_lin, xv, yv)

    print(f"dense accuracy        : {acc_dense:.3f}")
    print(f"after calibration     : {acc_post_calib:.3f}")
    print(f"after ternary QAT     : {acc_qat:.3f}")
    print(f"packed inference      : {acc_packed:.3f}  (must equal QAT)")
    assert abs(acc_packed - acc_qat) < 1e-6
    return acc_dense, acc_post_calib, acc_qat


if __name__ == "__main__":
    main()
