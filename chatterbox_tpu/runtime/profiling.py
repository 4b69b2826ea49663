"""Tracing / profiling utilities (greenfield vs the reference, which only has
a tqdm bar and wall-clock RTF -- SURVEY.md §5).

- ``StageTimer``: per-stage wall timers with RTF reporting
- ``trace(...)``: jax.profiler trace context writing TensorBoard protos
- ``annotate(name)``: TraceAnnotation for kernel-level attribution
"""

import contextlib
import json
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates per-stage wall time; `report(audio_seconds)` adds RTF."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, audio_seconds: float = None) -> dict:
        out = {k: round(v, 4) for k, v in self.totals.items()}
        total = sum(self.totals.values())
        out["total"] = round(total, 4)
        if audio_seconds:
            out["audio_seconds"] = round(audio_seconds, 3)
            out["rtf"] = round(total / audio_seconds, 4)
            out["audio_sec_per_s"] = round(audio_seconds / max(total, 1e-9), 3)
        return out

    def __str__(self):
        return json.dumps(self.report())


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)
