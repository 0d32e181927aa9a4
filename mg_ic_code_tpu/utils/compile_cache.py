"""Persistent XLA compilation cache configuration.

The canonical 7-level solve spends 400-770 s in one-time XLA compilation
against ~0.3-0.7 s per steady Picard iteration (docs/PERF.md) — for a tool
whose reference runs in a 24 h batch window that is tolerable once, but
every re-run pays it again. JAX's persistent compilation cache keys
executables on (HLO, compile options, backend), so re-running the same
configuration skips straight to execution.

Chombo has no analogue (C++ compiles ahead of time); this is the TPU-native
counterpart of simply *having* a compiled binary on disk.
"""

from __future__ import annotations

import os

import jax

_ENV = "MG_JAX_CACHE"
_DEFAULT = os.path.expanduser("~/.cache/mg_ic_code_tpu/jax")


def configure(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `path` (default: the
    MG_JAX_CACHE env var, else ~/.cache/mg_ic_code_tpu/jax). Set
    MG_JAX_CACHE=0 to disable. Safe to call more than once."""
    if path is None:
        path = os.environ.get(_ENV, _DEFAULT)
    if path in ("", "0", "none"):
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time; the default
        # (1 s) would skip the hundreds of small per-depth kernels whose
        # *sum* dominates the wall clock
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # pragma: no cover - cache is best-effort
        return None
    return path
