"""Speculative decoding INSIDE the continuous-batching engine: lossless
(identical greedy output with/without speculation) and fewer engine
iterations on repetitive prompts (VERDICT r1 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ternary_vllm_tpu.models import phi
from ternary_vllm_tpu.serve.engine import Engine

CFG = phi.TINY_PHI_CONFIG


@pytest.fixture(scope="module")
def params():
    return phi.init_phi_params(jax.random.PRNGKey(0), CFG)


def _run(eng, params, prompts, max_new=10, with_ids=True):
    steps = 0
    for p in prompts:
        eng.add_request(
            phi.embed_tokens(params, p), max_new_tokens=max_new,
            prompt_ids=p if with_ids else None,
        )
    while eng.queue or any(s is not None for s in eng.slots):
        eng.step()
        steps += 1
        assert steps < 500
    done = sorted(eng.completed, key=lambda r: r.request_id)
    return [r.tokens for r in done], steps


def test_spec_engine_lossless(params):
    specs = phi.layer_specs(CFG)
    prompts = [jnp.asarray([[5, 6, 7]]), jnp.asarray([[9, 1, 2, 3, 4]])]
    ref, _ = _run(Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(8,)),
                  params, prompts)
    got, _ = _run(
        Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(8,),
               speculative=4),
        params, prompts,
    )
    assert got == ref


def test_spec_engine_without_prompt_ids_lossless(params):
    """Requests without token ids (e.g. spliced image embeddings) still decode
    correctly — history seeds from generated tokens only."""
    specs = phi.layer_specs(CFG)
    prompts = [jnp.asarray([[5, 6, 7]])]
    ref, _ = _run(Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(8,)),
                  params, prompts, with_ids=False)
    got, _ = _run(
        Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(8,),
               speculative=3),
        params, prompts, with_ids=False,
    )
    assert got == ref


def test_spec_engine_fewer_iterations_on_repetitive_prompt(params):
    """A prompt whose continuation the model repeats verbatim accepts nearly
    every proposal: iteration count collapses vs 1 token/step.  Use an
    untrained model's natural loop behavior: random tiny models frequently
    cycle; assert the speculative engine needs at most half the iterations
    whenever the output IS repetitive, and never produces different tokens."""
    specs = phi.layer_specs(CFG)
    # repetitive prompt: a short cycle the n-gram proposer can latch onto
    prompts = [jnp.asarray([[4, 8, 4, 8, 4, 8]])]
    ref, ref_steps = _run(
        Engine(params, CFG, specs, max_batch=1, max_len=128, buckets=(8,)),
        params, prompts, max_new=24,
    )
    got, spec_steps = _run(
        Engine(params, CFG, specs, max_batch=1, max_len=128, buckets=(8,),
               speculative=4),
        params, prompts, max_new=24,
    )
    assert got == ref
    tail = ref[0][-8:]
    is_repetitive = len(set(tail)) <= 4
    if is_repetitive:
        assert spec_steps <= ref_steps // 2 + 1, (spec_steps, ref_steps)
    else:
        assert spec_steps <= ref_steps + 1


def test_spec_engine_slot_reuse(params):
    """History reseeds correctly when a freed slot is reused."""
    specs = phi.layer_specs(CFG)
    prompts = [jnp.asarray([[i + 1, i + 2, i + 3]]) for i in range(4)]
    ref, _ = _run(Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(8,)),
                  params, prompts, max_new=6)
    got, _ = _run(
        Engine(params, CFG, specs, max_batch=2, max_len=64, buckets=(8,),
               speculative=3),
        params, prompts, max_new=6,
    )
    assert got == ref


def test_spec_requires_greedy():
    with pytest.raises(ValueError, match="temperature"):
        Engine(None, CFG, phi.layer_specs(CFG), temperature=0.7, speculative=4)


def test_spec_burst_lossless():
    """burst > 1 with speculation: fused spec-burst iterations produce
    byte-identical output to plain greedy decode (and to burst=1 spec)."""
    import jax

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.serve.engine import Engine

    cfg = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), cfg)
    specs = phi.layer_specs(cfg)
    ids = jnp.asarray(np.random.default_rng(7).integers(0, cfg.vocab_size, (1, 12)))
    emb = phi.embed_tokens(params, ids)

    plain = Engine(params, cfg, specs, max_batch=1, max_len=128, buckets=(16,))
    plain.add_request(emb, max_new_tokens=20)
    ref = plain.run()[0].tokens

    for burst in (1, 8):
        eng = Engine(params, cfg, specs, max_batch=1, max_len=128, buckets=(16,),
                     speculative=3, burst=burst)
        eng.add_request(emb, max_new_tokens=20, prompt_ids=ids)
        assert eng.run()[0].tokens == ref, f"burst={burst}"


def test_spec_burst_eos_stops_device_side():
    import jax

    from ternary_vllm_tpu.models import phi
    from ternary_vllm_tpu.serve.engine import Engine

    cfg = phi.TINY_PHI_CONFIG
    params = phi.init_phi_params(jax.random.PRNGKey(0), cfg)
    specs = phi.layer_specs(cfg)
    ids = jnp.asarray(np.random.default_rng(8).integers(0, cfg.vocab_size, (1, 12)))
    emb = phi.embed_tokens(params, ids)

    probe = Engine(params, cfg, specs, max_batch=1, max_len=128, buckets=(16,))
    probe.add_request(emb, max_new_tokens=12)
    toks = probe.run()[0].tokens
    eos = toks[5]

    eng = Engine(params, cfg, specs, max_batch=1, max_len=128, buckets=(16,),
                 speculative=3, burst=8)
    eng.add_request(emb, max_new_tokens=12, eos_id=eos, prompt_ids=ids)
    got = eng.run()[0].tokens
    assert got == toks[: toks.index(eos) + 1]


def test_spec_auto_default_resolution(params):
    """speculative="auto" (the default) turns on k=4 for greedy engines and
    off for sampled ones."""
    specs = phi.layer_specs(CFG)
    eng = Engine(params, CFG, specs, max_batch=1, max_len=64, buckets=(8,))
    assert eng.spec_k == 4
    eng = Engine(params, CFG, specs, max_batch=1, max_len=64, buckets=(8,),
                 temperature=0.7)
    assert eng.spec_k == 0
    eng = Engine(params, CFG, specs, max_batch=1, max_len=64, buckets=(8,),
                 speculative=0)
    assert eng.spec_k == 0


def test_spec_adaptive_pauses_on_misses(params):
    """A slot that never accepts proposals is paused after spec_miss_limit
    zero-accept verifies: verify-forward count stops growing (plain decode
    serves the iterations) until the retry period elapses."""
    specs = phi.layer_specs(CFG)
    eng = Engine(params, CFG, specs, max_batch=1, max_len=256, buckets=(8,),
                 speculative=4, spec_miss_limit=2, spec_retry_period=10)
    prompt = jnp.asarray([[5, 6, 7]])
    eng.add_request(phi.embed_tokens(params, prompt), max_new_tokens=60,
                    prompt_ids=prompt)
    verifies = []
    for _ in range(40):
        if not (eng.queue or any(s is not None for s in eng.slots)):
            break
        eng.step()
        verifies.append(eng.stats["spec_verify_steps"])
    # if every verify accepted something the workload is repetitive — the
    # adaptive path never triggers and that's fine; otherwise the pause must
    # produce at least one run of iterations with NO new verifies
    if eng.stats["spec_accepted"] < eng.stats["spec_verify_steps"]:
        flat = sum(1 for a, b in zip(verifies, verifies[1:]) if a == b)
        assert flat > 0, "paused slot still ran verify forwards every step"


def test_spec_adaptive_lossless_through_pause_and_retry(params):
    """Output equality holds across pause -> plain decode -> re-seeded retry
    transitions (the retry re-seeds history from the host token log)."""
    specs = phi.layer_specs(CFG)
    prompts = [jnp.asarray([[5, 6, 7]]), jnp.asarray([[9, 1, 2, 3, 4]])]
    ref, _ = _run(
        Engine(params, CFG, specs, max_batch=2, max_len=128, buckets=(8,),
               speculative=0),
        params, prompts, max_new=40,
    )
    got, _ = _run(
        Engine(params, CFG, specs, max_batch=2, max_len=128, buckets=(8,),
               speculative=4, spec_miss_limit=1, spec_retry_period=3),
        params, prompts, max_new=40,
    )
    assert got == ref
