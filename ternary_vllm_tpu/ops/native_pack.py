"""ctypes bindings for the native host-side pack/calibrate library.

The reference binds its native ops through a TF custom-op .so / the LCE fork
(reference ``custom_ops_mod.py:1-33``, ``utils/conversion.py:69-72``); here
the host library is plain C ABI loaded with ctypes — no framework coupling.
Falls back transparently to the numpy implementations when the .so is absent;
``build()`` compiles it on demand with g++ (reference ``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_NAME = "libternary_pack.so"
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_i64 = ctypes.c_int64
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def build(force: bool = False) -> Optional[str]:
    """Compile the native library if g++ is available; returns its path."""
    path = os.path.abspath(os.path.join(_NATIVE_DIR, _LIB_NAME))
    if os.path.exists(path) and not force:
        return path
    script = os.path.abspath(os.path.join(_NATIVE_DIR, "build.sh"))
    try:
        subprocess.run(["bash", script], check=True, capture_output=True)
        return path
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    path = build()
    if path is None or not os.path.exists(path):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _load_failed = True
        return None
    lib.tp_pack_ternary.argtypes = [_f32p, _u8p, _i64, _i64]
    lib.tp_unpack_ternary.argtypes = [_u8p, _f32p, _i64, _i64, _i64]
    lib.tp_pack_binary.argtypes = [_f32p, _u8p, _i64, _i64]
    lib.tp_unpack_binary.argtypes = [_u8p, _f32p, _i64, _i64, _i64, ctypes.c_int]
    lib.tp_calibrate_ternary.argtypes = [_f32p, _f32p, _f32p, _i64, _i64, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def pack_ternary_native(w: np.ndarray) -> np.ndarray:
    """(K, N) float32 -> planar-packed (S, N) uint8; numpy fallback if no .so."""
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    s = (k + 3) // 4
    lib = _load()
    if lib is None:
        from ternary_vllm_tpu.ops.packing import pack_ternary_np

        return pack_ternary_np(w)
    out = np.empty((s, n), np.uint8)
    lib.tp_pack_ternary(w, out, k, n)
    return out


def unpack_ternary_native(packed: np.ndarray, k: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.uint8)
    s, n = packed.shape
    lib = _load()
    if lib is None:
        import jax.numpy as jnp

        from ternary_vllm_tpu.ops.packing import unpack_ternary

        return np.asarray(unpack_ternary(jnp.asarray(packed), k))
    out = np.empty((k, n), np.float32)
    lib.tp_unpack_ternary(packed, out, s, n, k)
    return out


def pack_binary_native(w: np.ndarray) -> np.ndarray:
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    s = (k + 7) // 8
    lib = _load()
    if lib is None:
        from ternary_vllm_tpu.ops.packing import pack_binary_np

        return pack_binary_np(w)
    out = np.empty((s, n), np.uint8)
    lib.tp_pack_binary(w, out, k, n)
    return out


def unpack_binary_native(packed: np.ndarray, k: int, zero_one: bool = False) -> np.ndarray:
    packed = np.ascontiguousarray(packed, np.uint8)
    s, n = packed.shape
    lib = _load()
    if lib is None:
        import jax.numpy as jnp

        from ternary_vllm_tpu.ops.packing import unpack_binary

        return np.asarray(unpack_binary(jnp.asarray(packed), k, zero_one))
    out = np.empty((k, n), np.float32)
    lib.tp_unpack_binary(packed, out, s, n, k, int(zero_one))
    return out


def calibrate_ternary_native(
    w: np.ndarray, kmeans_iter: int = 10
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel iterative-absmean calibration on the host (independent
    neuron scale).  Returns (latent (K,N), scale (N,))."""
    w = np.ascontiguousarray(w, np.float32)
    k, n = w.shape
    lib = _load()
    if lib is None:
        import jax.numpy as jnp

        from ternary_vllm_tpu.quant.calibrate import calibrate_ternary

        latent, scale = calibrate_ternary(jnp.asarray(w), "independent", kmeans_iter)
        return np.asarray(latent), np.asarray(scale)
    latent = np.empty_like(w)
    scale = np.empty((n,), np.float32)
    lib.tp_calibrate_ternary(w, latent, scale, k, n, kmeans_iter)
    return latent, scale
