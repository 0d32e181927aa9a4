"""Debug assertions, the CH_assert equivalent.

Chombo's CH_assert compiles away in optimized builds and aborts in DEBUG
builds (used at e.g. VariableCoeffPoissonOperator.cpp:85-87,
SetLevelData.cpp:36). Here: host-side checks are plain asserts; traced
(on-device) checks use jax.debug callbacks and are enabled with
`enable_debug_checks(True)` (off by default, like a release build).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_enabled = False


def enable_debug_checks(on: bool = True) -> None:
    global _enabled
    _enabled = on


def debug_checks_enabled() -> bool:
    return _enabled


def check_finite(x: jax.Array, name: str = "array") -> jax.Array:
    """In debug mode, abort (via callback raise) when x has NaN/Inf.
    Returns x unchanged so it chains inside jitted code."""
    if not _enabled:
        return x

    def _cb(ok):
        if not bool(ok):
            raise FloatingPointError(f"non-finite values in {name}")

    ok = jnp.all(jnp.isfinite(x))
    jax.debug.callback(_cb, ok)
    return x


def host_assert(cond: bool, msg: str) -> None:
    """Host-side precondition (always on: these are cheap shape/config
    checks, the moral equivalent of CH_assert on box metadata)."""
    if not cond:
        raise AssertionError(msg)
