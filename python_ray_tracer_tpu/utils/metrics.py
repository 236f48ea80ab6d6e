"""Structured metrics + profiling hooks (SURVEY §5.1/§5.5).

The reference's only instrumentation is ``time.time()`` around the pipeline
(``/root/reference/main.py:55-57``).  Here: JSONL metrics suited to
production telemetry, a rays/s meter, and ``jax.profiler`` trace capture
for XProf/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Iterator

import jax


class MetricsLogger:
    """Append-only JSONL metrics writer.

    Each record carries a monotonic timestamp and arbitrary scalar fields:
    ``{"ts": ..., "event": "step", "loss": ..., "rays_per_s": ...}``.
    """

    def __init__(self, path: str | Path | None):
        self._path = Path(path) if path else None
        self._t0 = time.perf_counter()
        if self._path:
            self._path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, event: str, **fields: Any) -> dict[str, Any]:
        record = {"ts": round(time.perf_counter() - self._t0, 6), "event": event, **fields}
        if self._path:
            with self._path.open("a") as f:
                f.write(json.dumps(record) + "\n")
        return record


def rays_per_second(n_rays: int, depth: int, seconds: float) -> dict[str, float]:
    """Throughput meter: primary rays and total trace segments per second.

    Each depth level costs one primary + one shadow sweep (SURVEY §3.6), so
    ``segments = n_rays * depth * 2``.
    """
    return {
        "primary_rays_per_s": n_rays / seconds,
        "trace_segments_per_s": n_rays * depth * 2 / seconds,
    }


@contextlib.contextmanager
def profile_trace(logdir: str | Path | None) -> Iterator[None]:
    """``jax.profiler`` capture around a region (view in XProf/Perfetto).

    No-op when ``logdir`` is None, so call sites can leave it wired in.
    """
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def named_scope(name: str) -> Iterator[None]:
    """Label a traced region in profiler output."""
    with jax.named_scope(name):
        yield
