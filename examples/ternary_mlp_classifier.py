"""BASELINE config 2 shape: a ternary MLP classifier trained with QAT.

Demonstrates using the framework's quantized-layer building blocks outside
the Phi stack: calibrate -> latent/STE training -> pack -> packed inference,
with accuracy measured before/after (synthetic two-moons-style data so the
example runs anywhere; swap in CIFAR-10 loading where data is available).

    python examples/ternary_mlp_classifier.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ternary_vllm_tpu.models.phi import LinearSpec, apply_linear
from ternary_vllm_tpu.ops.packing import pack_ternary
from ternary_vllm_tpu.ops.quantizers import tri_step_ste
from ternary_vllm_tpu.quant.calibrate import calibrate_ternary


def make_data(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 64)).astype(np.float32)
    w_true = rng.normal(size=(64, 1)).astype(np.float32)
    y = ((np.tanh(x @ w_true) + 0.3 * np.sin(3 * x[:, :1])) > 0).astype(np.int32)[:, 0]
    return jnp.asarray(x), jnp.asarray(y)


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


def accuracy(layers, specs, x, y):
    logits = forward(layers, specs, x)
    return float(jnp.mean((logits[:, 0] > 0) == (y > 0)))


def main():
    x, y = make_data()
    xt, yt = x[:3584], y[:3584]
    xv, yv = x[3584:], y[3584:]
    sizes = [64, 256, 256, 1]
    dense_specs = [LinearSpec()] * 3

    # 1. train dense
    layers = init_dense(jax.random.PRNGKey(0), sizes)
    tx = optax.adam(1e-3)

    def loss_fn(layers, specs, xb, yb):
        logits = forward(layers, specs, xb)[:, 0]
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, yb.astype(jnp.float32)))

    @jax.jit
    def dense_step(layers, opt_state, xb, yb):
        loss, g = jax.value_and_grad(loss_fn)(layers, dense_specs, xb, yb)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(layers, updates), opt_state, loss

    st = tx.init(layers)
    for i in range(300):
        j = (i * 256) % 3328
        layers, st, loss = dense_step(layers, st, xt[j : j + 256], yt[j : j + 256])
    acc_dense = accuracy(layers, dense_specs, xv, yv)

    # 2. calibrate -> ternary QAT
    qat_layers = []
    for p in layers:
        latent, scale = calibrate_ternary(p["w"])
        qat_layers.append({"latent": latent, "scale": scale, "b": p["b"]})
    qat_specs = [QAT] * 3
    acc_post_calib = accuracy(qat_layers, qat_specs, xv, yv)

    @jax.jit
    def qat_step(layers, opt_state, xb, yb):
        loss, g = jax.value_and_grad(loss_fn)(layers, qat_specs, xb, yb)
        updates, opt_state = tx.update(g, opt_state)
        layers = optax.apply_updates(layers, updates)
        layers = [dict(p, latent=jnp.clip(p["latent"], -1, 1)) for p in layers]
        return layers, opt_state, loss

    st = tx.init(qat_layers)
    for i in range(300):
        j = (i * 256) % 3328
        qat_layers, st, loss = qat_step(qat_layers, st, xt[j : j + 256], yt[j : j + 256])
    acc_qat = accuracy(qat_layers, qat_specs, xv, yv)

    # 3. pack for inference
    packed_layers = [
        {"packed": pack_ternary(tri_step_ste(p["latent"])), "scale": p["scale"], "b": p["b"]}
        for p in qat_layers
    ]
    acc_packed = accuracy(packed_layers, [PACKED] * 3, xv, yv)

    print(f"dense accuracy        : {acc_dense:.3f}")
    print(f"after calibration     : {acc_post_calib:.3f}")
    print(f"after ternary QAT     : {acc_qat:.3f}")
    print(f"packed inference      : {acc_packed:.3f}  (must equal QAT)")
    assert abs(acc_packed - acc_qat) < 1e-6
    return acc_dense, acc_qat


if __name__ == "__main__":
    main()
