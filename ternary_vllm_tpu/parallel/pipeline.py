"""Pipeline parallelism (GPipe-style microbatching) over a ``pipe`` mesh axis.

Net-new vs the reference (SURVEY.md §2: "The reference implements NONE of:
DP, TP, PP, ..."); built the TPU way rather than as a port of any NCCL
send/recv scheme:

* The decoder stack's per-layer params are **stacked along a leading layer
  axis and sharded over the ``pipe`` mesh axis** — each device holds a
  contiguous block of ``L / S`` layers (one pipeline *stage*) as a single
  pytree slab, scanned locally with ``lax.scan``.
* The schedule is SPMD: one ``shard_map`` program where every step each
  device (a) runs its stage on the activation it currently holds and
  (b) hands the result to its neighbor with ``lax.ppermute`` riding ICI.
  After ``M + S - 1`` steps all ``M`` microbatches have drained; the classic
  GPipe bubble is ``(S-1)/(M+S-1)``.
* Backward is just ``jax.grad`` through the scan — ``ppermute``'s transpose
  is the reverse ``ppermute``, so the backward pipeline (stage s receives
  output-grads from stage s+1) falls out of autodiff; no hand-written
  send/recv schedule.

Embedding lookup and the LM head run replicated outside the pipeline body
(in a combined mesh they would live on the tp axis); the pipeline covers the
decoder stack, which is where the depth is.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ternary_vllm_tpu.models import phi


def make_pipe_mesh(n_stages: int, devices: Optional[Sequence] = None, axis: str = "pipe") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n_stages]), (axis,))


def stack_layer_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Standard phi params (list of per-layer dicts) -> params with
    ``layers`` stacked along a leading layer axis (one leaf per tensor name,
    shape ``(L, ...)``) — the shardable form for the pipe axis.

    All layers must share one pytree structure (one LinearSpec kind), which
    holds for the uniform quantization configs the reference uses
    (``binary/utils.py:14-20`` skips are expressible by keeping skipped
    layers dense end-to-end, i.e. a uniform-dense or uniform-quant stack)."""
    layers = params["layers"]
    treedefs = {jax.tree.structure(l) for l in layers}
    if len(treedefs) != 1:
        raise ValueError("pipeline stages require homogeneous layer pytrees")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {**params, "layers": stacked}


def unstack_layer_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`stack_layer_params`."""
    stacked = params["layers"]
    n = jax.tree.leaves(stacked)[0].shape[0]
    layers = [jax.tree.map(lambda x, i=i: x[i], stacked) for i in range(n)]
    return {**params, "layers": layers}


def shard_pipeline_params(params: Dict[str, Any], mesh: Mesh, axis: str = "pipe"):
    """Place stacked params: layer-stacked leaves split over the pipe axis,
    everything else (wte, lm_head) replicated."""
    stage_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put_stage(x):
        return jax.device_put(x, stage_sharding)

    return {
        "wte": jax.device_put(params["wte"], repl),
        "layers": jax.tree.map(put_stage, params["layers"]),
        "lm_head": jax.tree.map(lambda x: jax.device_put(x, repl), params["lm_head"]),
    }


def _uniform_spec(specs) -> Dict[str, phi.LinearSpec]:
    specs = phi._spec_dicts(phi.freeze_specs(specs))
    if any(s != specs[0] for s in specs[1:]):
        raise ValueError("pipeline requires one uniform per-layer spec")
    return specs[0]


def pipeline_forward(
    params: Dict[str, Any],
    config: phi.PhiConfig,
    specs,
    inputs_embeds,
    mesh: Mesh,
    *,
    microbatches: int = 2,
    attn_mask=None,
    axis: str = "pipe",
    remat: bool = False,
):
    """Full-sequence forward (training path, no KV cache) through the
    pipelined decoder stack.  Returns logits ``(B, T, V)`` replicated.

    ``inputs_embeds``: (B, T, D) with ``B % microbatches == 0``;
    ``params``: output of :func:`stack_layer_params` (layers stacked (L, ...))
    with ``L % mesh.shape[axis] == 0``.
    """
    spec = _uniform_spec(specs)
    n_stages = mesh.shape[axis]
    n_layers = jax.tree.leaves(params["layers"])[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"L={n_layers} not divisible by {n_stages} stages")
    b, t, d = inputs_embeds.shape
    m = microbatches
    if b % m:
        raise ValueError(f"B={b} not divisible by microbatches={m}")
    mb = b // m

    positions = jnp.arange(t)
    cos, sin = phi._rope_cos_sin(positions, config.rotary_dim, config.rope_theta, jnp.float32)
    cos = cos.astype(inputs_embeds.dtype)
    sin = sin.astype(inputs_embeds.dtype)
    # per-microbatch additive masks (M, mb, 1, T, T); collapses to one causal
    # mask broadcast when there's no padding
    if attn_mask is not None:
        masks = phi._causal_mask_full(t, attn_mask, inputs_embeds.dtype).reshape(
            m, mb, 1, t, t
        )
    else:
        masks = jnp.broadcast_to(
            phi._causal_mask_full(t, None, inputs_embeds.dtype), (m, mb, 1, t, t)
        )

    mbs = inputs_embeds.reshape(m, mb, t, d)
    steps = m + n_stages - 1

    def layer_fn(x, layer_p, msk):
        y, _ = phi._decoder_layer(
            layer_p, spec, config, x, cos, sin, msk, None, 0, False
        )
        return y

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(None), P(None)),
        out_specs=P(None),
    )
    def _pipe(stage_layers, mbs_rep, masks_rep):
        stage = jax.lax.axis_index(axis)

        def stage_fn(x, msk):
            def body(xx, layer_p):
                if remat:
                    return jax.checkpoint(layer_fn)(xx, layer_p, msk), None
                return layer_fn(xx, layer_p, msk), None

            y, _ = jax.lax.scan(body, x, stage_layers)
            return y

        def step(state, i):
            # microbatch currently entering THIS stage at schedule step i
            mb_idx = jnp.clip(i - stage, 0, m - 1)
            mb_in = jax.lax.dynamic_index_in_dim(mbs_rep, mb_idx, 0, keepdims=False)
            msk = jax.lax.dynamic_index_in_dim(masks_rep, mb_idx, 0, keepdims=False)
            x_in = jnp.where(stage == 0, mb_in, state)
            y = stage_fn(x_in, msk)
            nxt = jax.lax.ppermute(
                y, axis, [(s, s + 1) for s in range(n_stages - 1)]
            )
            return nxt, y

        # device-varying zeros so the scan carry's type matches ppermute output
        state0 = jnp.zeros((mb, t, d), mbs_rep.dtype) + (stage * 0).astype(mbs_rep.dtype)
        _, ys = jax.lax.scan(step, state0, jnp.arange(steps))
        # last stage's outputs for steps S-1 .. S-1+M-1 are the drained
        # microbatches; zero elsewhere and psum-broadcast to all stages
        outs = jax.lax.slice_in_dim(ys, n_stages - 1, n_stages - 1 + m, axis=0)
        outs = jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, axis)

    hidden = _pipe(params["layers"], mbs, masks).reshape(b, t, d)
    return phi.lm_head(params, hidden, config), None


def pipeline_loss_fn(params, config, specs, mesh, batch, *, microbatches=2, axis="pipe"):
    """Next-token cross-entropy through the pipeline (labels -100 = ignored,
    matching the reference's collate, ``training/datasets/llava.py:58-108``)."""
    embeds = phi.embed_tokens(params, batch["input_ids"])
    logits, _ = pipeline_forward(
        params, config, specs, embeds, mesh,
        microbatches=microbatches, axis=axis,
        attn_mask=batch.get("attention_mask"),
    )
    labels = batch["labels"][:, 1:]
    lg = logits[:, :-1].astype(jnp.float32)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
