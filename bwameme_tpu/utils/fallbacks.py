"""Fallback accounting: demotions from fused/device paths are COUNTED and
LOUD, never silent.

The device engine and pipeline keep host-driven equivalents of every fused
program so a constrained TPU service (remote-compile body limits, dropped
tunnel connections) degrades gracefully. But a quiet demotion would turn a
kernel regression into an unexplained 10-50x slowdown, so:

* only *expected* runtime classes are caught (EXPECTED: XLA runtime/compile
  errors surface as RuntimeError subclasses; tunnel failures as OSError) —
  programming errors (TypeError, IndexError, ...) always propagate;
* every demotion increments a named counter (reported by StageTimer and
  checked by bench.py, which exits nonzero if a fused path fell back);
* BWAMEME_STRICT=1 disables fallbacks entirely: the original exception
  propagates (used by bench.py and CI-style runs).
"""

from __future__ import annotations

import os
import sys

# XLA compile/runtime errors subclass RuntimeError (jaxlib XlaRuntimeError);
# tunnel/transfer failures surface as OSError/ConnectionError.
EXPECTED = (RuntimeError, OSError)

COUNTS: dict[str, int] = {}


def strict() -> bool:
    return os.environ.get("BWAMEME_STRICT", "0") == "1"


def note(site: str, exc: BaseException) -> None:
    """Record a demotion at `site`. Re-raises the exception in strict
    mode; otherwise logs one loud stderr line and counts it."""
    if strict():
        raise exc
    COUNTS[site] = COUNTS.get(site, 0) + 1
    print(f"[fallback] {site}: {type(exc).__name__}: {exc}",
          file=sys.stderr)


def summary() -> dict[str, int]:
    return dict(COUNTS)


def reset() -> None:
    COUNTS.clear()


def total() -> int:
    return sum(COUNTS.values())
