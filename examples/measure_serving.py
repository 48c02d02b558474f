"""Serving-path benchmark: /retrieve latency + QPS on the real chip.

Measures the claim the serving design rests on (serve.py MicroBatcher:
"N concurrent queries cost ~1 jitted call"): p50/p99 latency and QPS for
closed-loop clients at several concurrency levels, MicroBatcher on/off,
int8 gallery on/off. Results land in BASELINE.md ("Serving performance").

The model is the real flagship geometry (ViT-S/16-class text tower:
DistilBERT 6L/768 at fixed_length 64); the gallery is synthetic
unit-norm embeddings (retrieval cost does not depend on their values).
Caveat recorded with the results: this container has ONE host CPU core —
client threads, HTTP handling and the device dispatch share it, so
absolute QPS understates a real serving host; the batching RATIOS are the
meaningful signal.

Usage:  python examples/measure_serving.py [--gallery 50000] [--secs 20]
Prints one JSON line per (mode, concurrency) cell.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np


def _client_loop(url: str, stop: threading.Event, lat: list,
                 shed: list) -> None:
    body = json.dumps({"query": "a photo of a dog on a beach",
                       "n": 9}).encode()
    while not stop.is_set():
        t0 = time.perf_counter()
        req = urllib.request.Request(url, data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                r.read()
        except urllib.error.HTTPError as e:
            if e.code != 503:
                raise
            # Load shed (MicroBatcher max_queue/deadline): the point of
            # the bounded-tail mode — record it, don't crash the client.
            shed.append(time.perf_counter() - t0)
            continue
        lat.append(time.perf_counter() - t0)


def run_cell(service, host, port, concurrency: int, secs: float) -> dict:
    from mae_clip_tpu.serve import make_server, serve_forever_in_thread

    server = make_server(service, host=host, port=port)
    thread = serve_forever_in_thread(server)
    url = f"http://{host}:{server.server_address[1]}/retrieve"

    # Warm the jitted path (compile outside the timed window).
    body = json.dumps({"query": "warmup query", "n": 9}).encode()
    for _ in range(2):
        req = urllib.request.Request(url, data=body,
                                     headers={"Content-Type":
                                              "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()

    stop = threading.Event()
    lat: list = []
    shed: list = []
    clients = [threading.Thread(target=_client_loop,
                                args=(url, stop, lat, shed),
                                daemon=True) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for c in clients:
        c.start()
    time.sleep(secs)
    stop.set()
    for c in clients:
        c.join(timeout=30)
    wall = time.perf_counter() - t0
    server.shutdown()
    thread.join(timeout=10)

    lat_ms = sorted(1e3 * x for x in lat)
    n = len(lat_ms)
    cell = {
        "concurrency": concurrency,
        "requests": n,
        "qps": round(n / wall, 1),
        "p50_ms": round(lat_ms[n // 2], 1) if n else None,
        "p99_ms": round(lat_ms[min(n - 1, int(n * 0.99))], 1) if n else None,
    }
    if shed:
        # p50/p99 above are ADMITTED requests only — the bounded tail the
        # max_queue/deadline knobs buy; shed requests got a fast 503.
        cell["shed"] = len(shed)
        cell["shed_rate"] = round(len(shed) / (len(shed) + n), 3)
        cell["shed_p99_ms"] = round(
            sorted(1e3 * x for x in shed)[int(len(shed) * 0.99)], 1)
    return cell


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gallery", type=int, default=50000)
    ap.add_argument("--secs", type=float, default=20.0)
    ap.add_argument("--concurrency", default="1,8,64")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--shed-queue", type=int, default=32,
                    help="max_queue for the shedding cells")
    ap.add_argument("--shed-deadline-ms", type=float, default=250.0,
                    help="deadline_ms for the shedding cells")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mae_clip_tpu.config import flagship_tpu_config
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.serve import RetrievalService

    cfg = flagship_tpu_config(batch_size=8, max_length=64)
    text_cfg = DistilBertConfig()
    model = CLIPModel(cfg, text_config=text_cfg, attn_impl="auto")

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(
            size=(2, cfg.size, cfg.size, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(
            0, text_cfg.vocab_size, size=(2, 16)).astype(np.int32)),
        "attention_mask": jnp.ones((2, 16), dtype=jnp.int32),
    }
    variables = jax.jit(
        lambda r, b: model.init(r, b, mask_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0), batch)

    corpus = ["a photo of a dog on a beach", "red ball", "cat sits",
              "a diagram", "noodle soup in a bowl"]
    tok_vocab = build_vocab(corpus * 4, vocab_size=256)
    tok = WordPieceTokenizer(tok_vocab)

    gal = rng.normal(size=(args.gallery, cfg.projection_dim)
                     ).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=-1, keepdims=True)
    names = [f"im{i}.jpg" for i in range(args.gallery)]

    backend = jax.default_backend()
    conc = [int(c) for c in args.concurrency.split(",")]
    for quantize in (False, True):
        for mode in ("plain", "micro", "micro_shed"):
            service = RetrievalService(
                model, variables, tok, gallery=jnp.asarray(gal),
                gallery_names=names, max_length=64, dedup_stride=5,
                quantize_gallery=quantize)
            if mode != "plain":
                shed = mode == "micro_shed"
                service.enable_micro_batching(
                    max_batch=16, max_wait_ms=3.0, fixed_length=64,
                    max_queue=args.shed_queue if shed else None,
                    deadline_ms=args.shed_deadline_ms if shed else None)
            for c in conc:
                cell = run_cell(service, "127.0.0.1", args.port, c,
                                args.secs)
                cell.update({"mode": mode, "int8_gallery": quantize,
                             "gallery": args.gallery, "backend": backend})
                if mode == "micro_shed":
                    cell.update({"max_queue": args.shed_queue,
                                 "deadline_ms": args.shed_deadline_ms})
                print(json.dumps(cell), flush=True)
            if service._batcher is not None:
                service._batcher.close()


if __name__ == "__main__":
    from mae_clip_tpu.utils.tpu_lock import tpu_lock
    with tpu_lock():
        main()
