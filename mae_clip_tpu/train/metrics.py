"""Metrics: count-weighted running averages, throughput, structured writer.

``AvgMeter`` reproduces the reference's count-weighted running mean
(reference: utils.py:1-16) so epoch losses over ragged batches match exactly.
``MetricWriter`` is the TensorBoard-equivalent of the reference's
``SummaryWriter(CFG.logdir)`` + ``add_scalars('loss', ...)`` (reference:
main.py:97,123): it always writes a machine-readable JSONL stream and, when
TensorFlow is available, mirrors scalars into TensorBoard event files.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Mapping, Optional


class AvgMeter:
    """Count-weighted running average (reference utils.py:1-16 semantics)."""

    def __init__(self, name: str = "Metric"):
        self.name = name
        self.reset()

    def reset(self) -> None:
        self.avg, self.sum, self.count = [0] * 3

    def update(self, val: float, count: int = 1) -> None:
        self.count += count
        self.sum += val * count
        self.avg = self.sum / self.count

    def __repr__(self) -> str:
        return f"{self.name}: {self.avg:.4f}"


class Throughput:
    """Examples/sec (and per-chip) over a sliding window of steps."""

    def __init__(self, num_chips: int = 1):
        self.num_chips = max(num_chips, 1)
        self._t0: Optional[float] = None
        self._examples = 0
        self._frozen_dt: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._examples = 0
        self._frozen_dt = None

    def stop(self) -> None:
        """Freeze the window (call at train-epoch end, AFTER the final
        metric drain so the clock covers real device work): reads taken
        later — e.g. ``Trainer.fit`` logging after the valid epoch — keep
        the train-epoch rate instead of diluting dt with eval time."""
        if self._t0 is not None:
            self._frozen_dt = time.perf_counter() - self._t0

    def update(self, batch_examples: int) -> None:
        if self._t0 is None:
            self.start()
        self._examples += batch_examples

    @property
    def examples_per_sec(self) -> float:
        if self._t0 is None or self._examples == 0:
            return 0.0
        dt = (self._frozen_dt if self._frozen_dt is not None
              else time.perf_counter() - self._t0)
        return self._examples / max(dt, 1e-9)

    @property
    def examples_per_sec_per_chip(self) -> float:
        return self.examples_per_sec / self.num_chips


class MetricWriter:
    """Structured scalar writer: JSONL always, TensorBoard when available."""

    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:  # TensorBoard via tf.summary, gated (no hard dependency).
            import tensorflow as tf  # type: ignore
            self._tb = tf.summary.create_file_writer(logdir)
        except Exception:
            self._tb = None

    def write_scalars(self, step: int, scalars: Mapping[str, float]) -> None:
        rec: Dict = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf  # type: ignore
            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=int(step))
                self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
