"""Profiling utilities + training determinism (the framework's
race-detection equivalent: same seed -> bit-identical run)."""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp

from mae_clip_tpu.utils.profiling import StepTimer, annotate, trace


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(5):
        with t:
            sum(range(1000))
    s = t.summary()
    assert s["count"] == 5
    assert s["min_s"] <= s["p50_s"] <= s["max_s"]


def test_trace_writes_files(tmp_path):
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        with annotate("matmul"):
            x = jnp.ones((64, 64))
            (x @ x).block_until_ready()
    produced = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert produced, "profiler trace produced no files"


def test_training_is_deterministic():
    """Two runs from the same seed produce identical loss sequences."""
    from tests.test_train import build, tiny_batch, tiny_cfg
    from mae_clip_tpu.train.loop import Trainer

    def run():
        cfg = tiny_cfg(epochs=2)
        model, variables, _ = build(cfg)
        trainer = Trainer(cfg, model, variables["params"])

        def loaders(epoch):
            rng = np.random.default_rng(1000 + epoch)
            return iter([{k: np.asarray(v)
                          for k, v in tiny_batch(rng).items()}
                         for _ in range(2)])

        return trainer.fit(loaders, loaders)

    a = run()
    b = run()
    assert a["train_loss"] == b["train_loss"]
    assert a["valid_loss"] == b["valid_loss"]


def test_trace_top_ops(tmp_path):
    """Parses a Perfetto-format trace dump into per-op totals."""
    import gzip
    import json

    from mae_clip_tpu.utils.profiling import trace_top_ops

    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.1",
         "ts": 0, "dur": 1500},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.1",
         "ts": 2000, "dur": 500},
        {"ph": "X", "pid": 3, "tid": 1, "name": "matmul.2",
         "ts": 3000, "dur": 3000},
        {"ph": "X", "pid": 7, "tid": 1, "name": "hostwork",
         "ts": 0, "dur": 9999},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    rows = trace_top_ops(str(tmp_path))
    assert rows[0]["name"] == "matmul.2" and rows[0]["total_ms"] == 3.0
    assert rows[1]["name"] == "fusion.1" and rows[1]["count"] == 2
    assert all("CPU" not in r["process"] for r in rows)
    host = trace_top_ops(str(tmp_path), device_only=False)
    assert any(r["name"] == "hostwork" for r in host)


def test_throughput_stop_freezes_window():
    """Trainer.fit reads the scalar after the valid epoch; stop() at
    train-epoch end must pin dt to the train window (train/metrics.py)."""
    import time

    from mae_clip_tpu.train.metrics import Throughput

    tp = Throughput(num_chips=2)
    tp.start()
    tp.update(100)
    tp.stop()
    frozen = tp.examples_per_sec
    time.sleep(0.05)
    assert tp.examples_per_sec == frozen          # later reads unchanged
    assert tp.examples_per_sec_per_chip == frozen / 2
    tp.start()                                     # next epoch resets
    tp.update(10)
    assert tp.examples_per_sec != frozen


def test_calibrate_tflops_smoke_cpu():
    """Measurement utility sanity (tiny n on CPU): positive, finite, and
    robust to constant per-call overhead by construction (median of
    pairwise slopes across chain lengths discards the intercept)."""
    from mae_clip_tpu.utils.calibrate import calibrate_tflops

    # n=512 keeps each matmul ~ms-scale on CPU so the pairwise slopes
    # are measurable (n=128 is sub-noise and the slope clamps).
    rate = calibrate_tflops(lengths=(1, 3, 5), repeats=2, n=512)
    assert rate > 0 and rate < 50, rate     # finite, CPU-scale
