"""Per-stage wall-clock profiling — the analog of the reference's rdtsc
counter matrix + display_stats (reference: src/profiling.cpp:54-160,
src/macro.h:72-178). Keeps a display_stats-style end-of-run breakdown."""

from __future__ import annotations

import contextlib
import sys
import time
from collections import defaultdict


class StageTimer:
    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, out=sys.stderr) -> None:
        if not self.totals:
            return
        total = sum(self.totals.values())
        print("[stats] stage breakdown:", file=out)
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            print(f"[stats]   {name:<14} {t:8.2f}s  {100*t/max(total,1e-9):5.1f}%"
                  f"  ({self.counts[name]} calls)", file=out)
        print(f"[stats]   {'total':<14} {total:8.2f}s", file=out)
        from bwameme_tpu.utils import fallbacks

        for site, n in sorted(fallbacks.summary().items()):
            print(f"[stats]   FALLBACK {site}: {n}x (fused/device path "
                  "demoted — investigate before trusting throughput)",
                  file=out)
