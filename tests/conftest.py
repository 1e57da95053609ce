"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-device sharding code (pjit/shard_map) is exercised on CPU via
``--xla_force_host_platform_device_count`` — the JAX-native replacement for
distributed test rigs (see SURVEY.md §4).

Note: this environment's sitecustomize registers a TPU PJRT plugin and
force-sets ``jax_platforms`` at interpreter start, so the env var alone is not
enough — we must override the config *after* importing jax (conftest runs
before any test imports trigger backend initialization, so this is safe).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# exact f32 matmuls so golden-parity tolerances are meaningful
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", False)
