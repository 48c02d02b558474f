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


def trace_top_ops(trace_dir: str, top: int = 30,
                  device_only: bool = True) -> List[dict]:
    """Aggregate a :func:`trace` capture into per-op total durations.

    Parses the newest ``*.trace.json.gz`` under ``trace_dir`` (the
    Perfetto-format file jax.profiler writes) and sums complete ('X')
    events by name per process. This is how the step-time breakdowns in
    BASELINE.md were produced — it works headless over the remote-TPU
    tunnel where the TensorBoard profiler UI is unavailable.

    Returns [{name, total_ms, count, process}] sorted by total_ms desc.
    """
    import glob
    import gzip
    import json
    import os

    files = sorted(glob.glob(os.path.join(trace_dir, "**",
                                          "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    data = json.load(gzip.open(files[-1]))
    events = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"]["name"] for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}

    agg: dict = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        proc = pids.get(e["pid"], str(e["pid"]))
        if device_only and "TPU" not in proc and "GPU" not in proc:
            continue
        key = (proc, e.get("name", "?"))
        tot, cnt = agg.get(key, (0.0, 0))
        agg[key] = (tot + e.get("dur", 0), cnt + 1)

    rows = [{"process": k[0], "name": k[1], "total_ms": v[0] / 1e3,
             "count": v[1]} for k, v in agg.items()]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows[:top]


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
