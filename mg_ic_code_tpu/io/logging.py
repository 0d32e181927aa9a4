"""Per-process log streams with verbosity gating.

Equivalent of Chombo's pout()/parstream (reference: every driver progress
line, e.g. Main_PoissonSolver.cpp:133-134,149,210; SURVEY §5): in a
multi-process (multi-host) run each process writes to its own `pout.<n>`
file, process 0 also mirrors to stdout; single-process runs log to stdout.
`verbosity` gates detail exactly like the reference's parameter
(PoissonParameters.cpp:62-64).
"""

from __future__ import annotations

import sys
from typing import TextIO

import jax

_stream: TextIO | None = None
_verbosity: int = 2


def set_verbosity(v: int) -> None:
    global _verbosity
    _verbosity = v


def verbosity() -> int:
    return _verbosity


def _ensure_stream() -> TextIO:
    global _stream
    if jax.process_count() > 1:
        if _stream is None:
            # per-process pout.<n> files, like Chombo's parstream
            _stream = open(f"pout.{jax.process_index()}", "a", buffering=1)
        return _stream
    # single process: always the CURRENT stdout (never cache it — test
    # harnesses and redirections swap sys.stdout underneath us)
    return sys.stdout


def pout(msg: str, level: int = 1) -> None:
    """Write a log line if `level` <= current verbosity. Process 0 mirrors
    to stdout in multi-process runs."""
    if level > _verbosity:
        return
    s = _ensure_stream()
    print(msg, file=s)
    if s is not sys.stdout and jax.process_index() == 0:
        print(msg)
