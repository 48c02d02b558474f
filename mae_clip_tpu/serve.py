"""Inference serving: embedding + retrieval over HTTP.

The reference has no serving layer (its inference is notebook/matplotlib,
reference inference.py:49-56). This module packages the inference
capabilities — text/image embedding, text->image retrieval over a
precomputed gallery, zero-shot classification — behind jitted batch
functions and a dependency-free stdlib HTTP server (JSON in/out), suitable
for fronting a TPU chip.

Endpoints:
  GET  /healthz                      -> {"status": "ok", ...}
  POST /embed_text {"texts": [...]}  -> {"embeddings": [[...], ...]}
  POST /retrieve   {"query": "...", "n": 9}
                                     -> {"matches": [...], "scores": [...]}
  POST /zeroshot   {"labels": [...], "image": [[..HWC..]]}
                                     -> {"probs": {label: p}}
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mae_clip_tpu.ops.retrieval import l2_normalize, retrieval_topk


class Overloaded(RuntimeError):
    """The serving queue is over capacity (or a request aged past its
    deadline before reaching the device). Maps to HTTP 503 — callers
    should back off and retry."""


class MicroBatcher:
    """Dynamic request coalescing for TPU serving.

    A TPU executes one program at a time, and a 1-query retrieval costs
    nearly the same as a 16-query one (the gallery matmul is HBM-bound) —
    so concurrent single requests are batched: the worker takes the first
    queued item, waits up to ``max_wait_ms`` for more (up to ``max_batch``),
    and runs ONE ``fn(items) -> results`` call for the whole batch.
    Callers block in ``submit`` until their result is ready. Exceptions
    propagate to every caller in the failed batch.

    Tail bounding (round-4; BASELINE.md serving table measured c=64 p99 at
    1.2-1.5 s with an unbounded queue): ``max_queue`` caps the number of
    waiting items — ``submit`` raises :class:`Overloaded` instead of
    enqueueing beyond it, so latency for ADMITTED requests is bounded by
    ~(max_queue / max_batch + 1) device calls; ``deadline_ms`` additionally
    sheds items that already waited that long when the worker dequeues
    them (they raise :class:`Overloaded` without costing a device call).
    Both default off (unbounded, the pre-round-4 behavior).
    """

    _STOP = object()

    def __init__(self, fn: Callable[[List[Any]], List[Any]],
                 max_batch: int = 16, max_wait_ms: float = 5.0,
                 max_queue: Optional[int] = None,
                 deadline_ms: Optional[float] = None):
        self.fn = fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.max_queue = max_queue
        self.deadline = deadline_ms / 1e3 if deadline_ms else None
        self.batches_run = 0
        self.items_run = 0
        self.items_shed = 0
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, item: Any) -> Any:
        if self.max_queue is not None and self._q.qsize() >= self.max_queue:
            # qsize() is advisory under concurrency, which is fine here:
            # the cap is a load-shedding threshold, not an invariant.
            self.items_shed += 1
            raise Overloaded(
                f"serving queue at capacity ({self.max_queue} waiting)")
        ev = threading.Event()
        box: Dict[str, Any] = {}
        self._q.put((item, ev, box, time.monotonic()))
        ev.wait()
        if "error" in box:
            raise box["error"]
        return box["result"]

    def close(self) -> None:
        self._q.put(self._STOP)
        self._thread.join(timeout=5)

    def _shed_expired(self, batch):
        """Split off items whose queue wait already exceeds the deadline;
        fail them fast (no device call) so the admitted tail stays
        bounded under bursts."""
        if self.deadline is None:
            return batch
        now = time.monotonic()
        keep = []
        for entry in batch:
            if now - entry[3] > self.deadline:
                entry[2]["error"] = Overloaded(
                    f"request waited > {self.deadline * 1e3:.0f} ms in "
                    f"the serving queue")
                entry[1].set()
                self.items_shed += 1
            else:
                keep.append(entry)
        return keep

    def _loop(self) -> None:
        while True:
            first = self._q.get()
            if first is self._STOP:
                return
            batch: List[Tuple[Any, threading.Event, Dict, float]] = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is self._STOP:
                    self._q.put(self._STOP)   # re-queue for the outer loop
                    break
                batch.append(nxt)
            batch = self._shed_expired(batch)
            if not batch:
                continue
            try:
                results = self.fn([b[0] for b in batch])
                for (item, ev, box, _), r in zip(batch, results):
                    box["result"] = r
                    ev.set()
            except Exception as e:                 # noqa: BLE001
                for _, ev, box, _ in batch:
                    box["error"] = e
                    ev.set()
            self.batches_run += 1
            self.items_run += len(batch)


class RetrievalService:
    """Jitted embedding/retrieval core shared by the server and tests."""

    def __init__(self, model, variables, tokenizer,
                 gallery: Optional[jax.Array] = None,
                 gallery_names: Optional[Sequence[str]] = None,
                 max_length: Optional[int] = None,
                 dedup_stride: int = 1,
                 quantize_gallery: bool = False):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.gallery = gallery
        self.gallery_names = list(gallery_names or [])
        self.max_length = max_length
        self.dedup_stride = dedup_stride
        # int8 gallery at rest (4x less serving memory): normalized rows
        # quantized per-row; top-k dequantizes chunks on the fly.
        self.gallery_q = self.gallery_scales = None
        if gallery is not None and quantize_gallery:
            from mae_clip_tpu.ops.retrieval import quantize_embeddings
            self.gallery_q, self.gallery_scales = quantize_embeddings(
                l2_normalize(jnp.asarray(gallery).astype(jnp.float32)))
            self.gallery = None

        from mae_clip_tpu.eval.retrieval import (_image_embed_fn,
                                                 _text_embed_fn)

        self._embed_text = _text_embed_fn(model)
        self._embed_image = _image_embed_fn(model)
        self._batcher: Optional[MicroBatcher] = None

    # -- micro-batching ----------------------------------------------------
    def enable_micro_batching(self, max_batch: int = 16,
                              max_wait_ms: float = 5.0,
                              fixed_length: Optional[int] = None,
                              max_n: int = 50,
                              max_queue: Optional[int] = None,
                              deadline_ms: Optional[float] = None
                              ) -> MicroBatcher:
        """Coalesce concurrent /retrieve requests into ONE jitted call.

        Shapes are pinned — queries tokenized to ``fixed_length``
        (defaults to the service's ``max_length``), batches padded to
        ``max_batch``, top-k at ``dedup_stride * max_n`` (clamped to the
        gallery size) — so the executable compiles exactly once
        (per-batch ragged shapes would retrace XLA on every distinct
        size). Requests asking for more than ``max_n`` results get
        ``max_n`` (the static-k ceiling).
        """
        if not self.gallery_size:
            raise ValueError("micro-batching needs a gallery loaded")
        self._mb_fixed_length = fixed_length or self.max_length or 64
        self._mb_max_batch = max_batch
        self._mb_k = min(self.dedup_stride * max_n, self.gallery_size)
        self._mb_max_n = max_n
        self._batcher = MicroBatcher(self._retrieve_many,
                                     max_batch=max_batch,
                                     max_wait_ms=max_wait_ms,
                                     max_queue=max_queue,
                                     deadline_ms=deadline_ms)
        return self._batcher

    def _retrieve_many(self, items: List[Tuple[str, int]]) -> List[Dict]:
        from mae_clip_tpu.data.pipeline import pad_token_batch

        queries = [q for q, _ in items]
        enc = self.tokenizer.encode_batch(
            queries, max_length=self._mb_fixed_length,
            fixed_length=self._mb_fixed_length)
        ids, mask = pad_token_batch(
            np.asarray(enc["input_ids"], np.int32),
            np.asarray(enc["attention_mask"], np.int32),
            self._mb_max_batch)
        emb = self._embed_text(self.variables, jnp.asarray(ids),
                               jnp.asarray(mask))
        scores, idx = self._topk(emb, self._mb_k)
        scores, idx = np.asarray(scores), np.asarray(idx)
        out = []
        for row, (_, n) in enumerate(items):
            n = min(n, self._mb_max_n)
            ri = idx[row][::self.dedup_stride][:n]
            rs = scores[row][::self.dedup_stride][:n]
            names = ([self.gallery_names[i] for i in ri]
                     if self.gallery_names else ri.tolist())
            out.append({"matches": names, "scores": rs.tolist(),
                        "indices": ri.tolist()})
        return out

    # -- API ---------------------------------------------------------------
    def embed_text(self, texts: Sequence[str]) -> np.ndarray:
        enc = self.tokenizer.encode_batch(list(texts),
                                          max_length=self.max_length)
        ids = jnp.asarray(enc["input_ids"], jnp.int32)
        mask = jnp.asarray(enc["attention_mask"], jnp.int32)
        return np.asarray(self._embed_text(self.variables, ids, mask))

    def embed_images(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._embed_image(self.variables,
                                            jnp.asarray(images)))

    @property
    def gallery_size(self) -> int:
        if self.gallery is not None:
            return int(self.gallery.shape[0])
        if self.gallery_q is not None:
            return int(self.gallery_q.shape[0])
        return 0

    def _topk(self, emb, k: int):
        if self.gallery_q is not None:
            from mae_clip_tpu.ops.retrieval import retrieval_topk_int8
            return retrieval_topk_int8(emb, self.gallery_q,
                                       self.gallery_scales, k=k)
        return retrieval_topk(emb, self.gallery, k=k)

    def retrieve(self, query: str, n: int = 9) -> Dict:
        if not self.gallery_size:
            raise ValueError("service has no gallery loaded")
        if self._batcher is not None:
            return self._batcher.submit((query, n))
        text_emb = jnp.asarray(self.embed_text([query]))
        k = min(n * self.dedup_stride, self.gallery_size)
        scores, idx = self._topk(text_emb, k)
        idx = np.asarray(idx)[0][::self.dedup_stride][:n]
        scores = np.asarray(scores)[0][::self.dedup_stride][:n]
        names = ([self.gallery_names[i] for i in idx]
                 if self.gallery_names else idx.tolist())
        return {"matches": names, "scores": scores.tolist(),
                "indices": idx.tolist()}

    def zeroshot(self, labels: Sequence[str], image: np.ndarray,
                 template="a photo of a {}",
                 scale: float = 100.0) -> Dict[str, float]:
        # str or sequence of str (CLIP-paper prompt ensembling: normalized
        # per-template embeddings averaged per class, re-normalized).
        templates = ([template] if isinstance(template, str)
                     else list(template))
        per = l2_normalize(jnp.asarray(self.embed_text(
            [t.format(l) for l in labels for t in templates])))
        cls = l2_normalize(per.reshape(len(labels), len(templates),
                                       -1).mean(axis=1))
        img = l2_normalize(jnp.asarray(self.embed_images(image[None])))
        params = self.variables.get("params", {})
        if "logit_scale" in params and "logit_bias" in params:
            # SigLIP checkpoint (both scalars present only for that
            # objective): calibrated per-label sigmoid probabilities with
            # the TRAINED scale/bias (arXiv:2303.15343 §4.2) — same
            # ranking as the softmax protocol, but probs don't sum to 1.
            probs = jax.nn.sigmoid(
                jnp.exp(params["logit_scale"]) * (img @ cls.T)
                + params["logit_bias"])
        elif "logit_scale" in params:
            # Learnable-temperature softmax/clip checkpoint: score with
            # the trained exp(s), clamped at 100 like the training loss.
            trained = jnp.minimum(jnp.exp(params["logit_scale"]), 100.0)
            probs = jax.nn.softmax(trained * (img @ cls.T), axis=-1)
        else:
            probs = jax.nn.softmax(scale * (img @ cls.T), axis=-1)
        return {l: float(p) for l, p in zip(labels, np.asarray(probs)[0])}


def make_server(service: RetrievalService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: Dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                payload = {
                    "status": "ok",
                    "gallery_size": service.gallery_size,
                    "backend": jax.default_backend(),
                }
                b = service._batcher
                if b is not None:
                    payload["batcher"] = {
                        "batches_run": b.batches_run,
                        "items_run": b.items_run,
                        "items_shed": b.items_shed,
                    }
                self._send(200, payload)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/embed_text":
                    emb = service.embed_text(req["texts"])
                    self._send(200, {"embeddings": emb.tolist()})
                elif self.path == "/embed_image":
                    # Contract: images arrive resized to the model size.
                    # "raw_uint8": true = 0-255 pixels, ImageNet-normalized
                    # server-side; default = ALREADY-normalized floats
                    # (JSON carries no dtype, so the caller must say which
                    # — silently embedding 0-255 floats would produce
                    # garbage relative to the gallery).
                    raw = bool(req.get("raw_uint8", False))
                    imgs = np.asarray(req["images"],
                                      dtype=np.uint8 if raw else np.float32)
                    if imgs.ndim == 3:       # single (H, W, C) image
                        imgs = imgs[None]
                    emb = service.embed_images(imgs)
                    self._send(200, {"embeddings": emb.tolist()})
                elif self.path == "/retrieve":
                    self._send(200, service.retrieve(req["query"],
                                                     int(req.get("n", 9))))
                elif self.path == "/zeroshot":
                    img = np.asarray(
                        req["image"],
                        dtype=(np.uint8 if req.get("raw_uint8", False)
                               else np.float32))
                    self._send(200, {"probs": service.zeroshot(
                        req["labels"], img,
                        template=req.get("template", "a photo of a {}"))})
                else:
                    self._send(404, {"error": "not found"})
            except Overloaded as e:  # shed load: bounded tail, retryable
                self._send(503, {"error": f"Overloaded: {e}"})
            except Exception as e:  # surface errors as JSON, keep serving
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t
