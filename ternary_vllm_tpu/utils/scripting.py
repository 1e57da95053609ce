"""Config lookup with environment-variable override.

Parity with the reference's flag system (reference ``utils/scripting.py:4-5``):
an env var named ``NAME.upper()`` takes precedence over the argparse value.
Typed: the env string is coerced to the type of the argparse default.
"""

from __future__ import annotations

import os
from typing import Any


def _coerce(raw: str, like: Any):
    if isinstance(like, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(like, int):
        return int(raw)
    if isinstance(like, float):
        return float(raw)
    return raw


def get_var(name: str, args) -> Any:
    """``get_var("learning_rate", args)`` → env ``LEARNING_RATE`` if set, else
    ``args.learning_rate``."""
    attr = name.replace("-", "_")
    current = getattr(args, attr)
    raw = os.environ.get(name.upper().replace("-", "_"))
    if raw is None:
        return current
    return _coerce(raw, current)


def make_parser_value(args, names) -> dict:
    """Resolve a list of flag names through :func:`get_var` into a dict."""
    return {n: get_var(n, args) for n in names}
