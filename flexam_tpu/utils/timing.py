"""Timing / observability.

Reference: homemade `timer` / `timer_record` decorators writing to an
Excel sheet (`FlexAM/utils/utils.py:570-630`). TPU plan (SURVEY.md §5.1):
structured JSON metrics + jax.block_until_ready-accurate timing, plus the
jax profiler for deep traces.
"""

from __future__ import annotations

import functools
import json
import os
import time
from contextlib import contextmanager
from typing import Dict, Optional


class Metrics:
    """Accumulates named wall-clock spans; dumps one JSON object."""

    def __init__(self):
        self.spans: Dict[str, float] = {}
        self.counters: Dict[str, float] = {}

    @contextmanager
    def span(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax
                jax.block_until_ready(sync)
            self.spans[name] = self.spans.get(name, 0.0) + (
                time.perf_counter() - t0)

    def count(self, name: str, value: float = 1.0):
        self.counters[name] = self.counters.get(name, 0.0) + value

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps({"spans_s": self.spans, "counters": self.counters},
                       indent=2)
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                f.write(s)
        return s


metrics = Metrics()


def timer(func):
    """Wall-clock print decorator (`utils.py:570-577` equivalent)."""
    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = func(*args, **kwargs)
        dt = time.perf_counter() - t0
        print(f"[timer] {func.__name__}: {dt:.3f}s")
        metrics.spans[func.__name__] = metrics.spans.get(
            func.__name__, 0.0) + dt
        return out
    return wrapper


@contextmanager
def jax_profile(logdir: str):
    """jax profiler trace (SURVEY.md §5.1 TPU plan)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
