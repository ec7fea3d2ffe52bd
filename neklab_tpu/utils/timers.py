"""Hierarchical named-scope timers with an exit summary.

Reference parity: LightKrylov's `global_lightkrylov_timer` wrapped around
every analysis driver with a flush to lightkrylov_tmr.log
(SURVEY section 5, tracing). Use as:

    with timer("eigs"):
        ...
    timer.report()          # or timer.write("timers.log")

For on-device profiles use jax.profiler alongside; these timers capture the
host-side orchestration structure (matvecs, dense algebra, I/O).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class Timers:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._stack: list[str] = []

    @contextmanager
    def __call__(self, name: str):
        full = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._stack.pop()
            self.totals[full] += dt
            self.counts[full] += 1

    def report(self) -> str:
        lines = ["--- timers ---"]
        for k in sorted(self.totals):
            depth = k.count("/")
            lines.append(
                f"{'  ' * depth}{k.split('/')[-1]:<30s} {self.totals[k]:10.3f}s  x{self.counts[k]}"
            )
        out = "\n".join(lines)
        print(out)
        return out

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.report())

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


timer = Timers()
