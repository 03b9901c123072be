"""Phase timing — the structured replacement for the reference's
cout/clog chrono pairs around every MICE phase (imputation_base.cpp:8-12,
32-38,102-118,136-142). Accumulates per-phase wall-clock; integrates with
jax.profiler traces when requested."""
from __future__ import annotations

import collections
import contextlib
import time


class PhaseTimer:
    def __init__(self, verbose: bool = False):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)
        self.verbose = verbose

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if self.verbose:
                print(f"[{name}] {dt * 1e3:.1f} ms")

    def summary(self) -> dict[str, float]:
        return dict(self.totals)

    def report(self) -> str:
        lines = [f"{k}: {v * 1e3:.1f} ms ({self.counts[k]}x)"
                 for k, v in sorted(self.totals.items())]
        return "\n".join(lines)

    def to_json(self) -> str:
        import json
        return json.dumps({k: {"total_s": v, "count": self.counts[k]}
                           for k, v in self.totals.items()})


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (perfetto/tensorboard-compatible) of
    everything inside the context — the structured replacement for the
    reference's chrono-printf instrumentation."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
