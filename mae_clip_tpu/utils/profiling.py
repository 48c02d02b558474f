"""Tracing / profiling.

The reference's only instrumentation is tqdm postfix text (reference:
main.py:53-66; SURVEY.md §5 lists tracing as absent). TPU-native equivalent:

* ``trace(logdir)``: context manager around ``jax.profiler`` producing
  Perfetto/XProf-compatible traces of device execution;
* ``start_profiler_server(port)``: live-attach server for
  ``tensorboard --logdir`` / xprof capture;
* ``annotate(name)``: named host span that shows up in the trace timeline;
* ``StepTimer``: wall-clock step statistics (mean/p50/p95) that pair with
  the Throughput meter in train/metrics.py.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional


def start_profiler_server(port: int = 9999) -> None:
    import jax
    jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    import jax
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing with percentile summary."""

    def __init__(self):
        self._samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        assert self._t0 is not None
        self._samples.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def count(self) -> int:
        return len(self._samples)

    def summary(self) -> dict:
        if not self._samples:
            return {"count": 0}
        xs = sorted(self._samples)
        n = len(xs)
        return {
            "count": n,
            "mean_s": sum(xs) / n,
            "p50_s": xs[n // 2],
            "p95_s": xs[min(n - 1, int(n * 0.95))],
            "min_s": xs[0],
            "max_s": xs[-1],
        }
