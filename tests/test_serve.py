"""Serving layer: jitted service core + HTTP endpoints end-to-end."""

import json
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mae_clip_tpu.config import Config
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.models.vit import ViTConfig
from mae_clip_tpu.serve import (RetrievalService, make_server,
                                serve_forever_in_thread)


@pytest.fixture(scope="module")
def service():
    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16)
    tok = WordPieceTokenizer(build_vocab(
        ["a red square", "a blue circle", "a green dog"], vocab_size=64,
        min_frequency=1))
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=16,
                                     n_layers=1, n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    rng = np.random.default_rng(0)
    batch = {"image": jnp.array(rng.normal(size=(2, 16, 16, 3)).astype(np.float32)),
             "input_ids": jnp.array(rng.integers(0, tok.vocab_size, (2, 8)).astype(np.int32)),
             "attention_mask": jnp.ones((2, 8), dtype=jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch)

    svc = RetrievalService(model, variables, tok, max_length=16)
    gallery = svc.embed_images(
        rng.normal(size=(5, 16, 16, 3)).astype(np.float32))
    svc.gallery = jnp.asarray(gallery)
    svc.gallery_names = [f"img{i}.jpg" for i in range(5)]
    return svc


def test_service_embed_and_retrieve(service):
    emb = service.embed_text(["a red square", "a blue circle"])
    assert emb.shape == (2, 8)
    out = service.retrieve("a red square", n=3)
    assert len(out["matches"]) == 3
    assert all(m in service.gallery_names for m in out["matches"])
    assert sorted(out["scores"], reverse=True) == out["scores"]


def test_service_zeroshot(service):
    rng = np.random.default_rng(1)
    probs = service.zeroshot(["red", "blue", "dog"],
                             rng.normal(size=(16, 16, 3)).astype(np.float32))
    assert set(probs) == {"red", "blue", "dog"}
    assert abs(sum(probs.values()) - 1.0) < 1e-4


def test_http_server_endpoints(service):
    server = make_server(service, port=0)
    serve_forever_in_thread(server)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    with urllib.request.urlopen(base + "/healthz") as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["gallery_size"] == 5

    emb = post("/embed_text", {"texts": ["a red square"]})
    assert len(emb["embeddings"][0]) == 8

    rng_img = np.random.default_rng(3)
    img = rng_img.normal(size=(16, 16, 3)).tolist()
    one = post("/embed_image", {"images": img})          # single (H,W,C)
    batch = post("/embed_image", {"images": [img, img]})  # (N,H,W,C)
    assert len(one["embeddings"]) == 1
    assert len(one["embeddings"][0]) == 8
    # different batch shape -> different executable; equal to fp tolerance
    np.testing.assert_allclose(batch["embeddings"][0],
                               one["embeddings"][0], atol=1e-5)

    # raw_uint8: true => 0-255 pixels are ImageNet-normalized server-side
    # (JSON has no dtype; the float default assumes pre-normalized input).
    from mae_clip_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD
    pix = np.random.default_rng(4).integers(
        0, 255, size=(16, 16, 3)).astype(np.uint8)
    normed = ((pix.astype(np.float32) / 255.0
               - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD))
    raw = post("/embed_image", {"images": pix.tolist(), "raw_uint8": True})
    pre = post("/embed_image", {"images": normed.tolist()})
    np.testing.assert_allclose(raw["embeddings"], pre["embeddings"],
                               atol=1e-4)

    ret = post("/retrieve", {"query": "a blue circle", "n": 2})
    assert len(ret["matches"]) == 2

    rng = np.random.default_rng(2)
    zs = post("/zeroshot", {"labels": ["red", "blue"],
                            "image": rng.normal(size=(16, 16, 3)).tolist()})
    assert set(zs["probs"]) == {"red", "blue"}

    # Error surface: bad request -> 400 JSON, server stays up.
    try:
        post("/retrieve", {"n": 2})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    with urllib.request.urlopen(base + "/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"
    server.shutdown()


def test_micro_batching_coalesces_and_matches_sequential(service):
    """Concurrent /retrieve requests coalesce into fewer jitted calls and
    return the same results as the unbatched path."""
    import threading

    # Ground truth via the unbatched path.
    service._batcher = None
    want = {q: service.retrieve(q, n=3)
            for q in ("a red square", "a blue circle", "a green dog")}

    batcher = service.enable_micro_batching(max_batch=8, max_wait_ms=50.0,
                                            fixed_length=16, max_n=5)
    try:
        results = {}
        lock = threading.Lock()

        def worker(q):
            r = service.retrieve(q, n=3)
            with lock:
                results[q] = r

        threads = [threading.Thread(target=worker, args=(q,))
                   for q in want for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for q, r in results.items():
            assert r["matches"] == want[q]["matches"]
            np.testing.assert_allclose(r["scores"], want[q]["scores"],
                                       rtol=1e-5)
        # 6 requests landed in fewer batches than requests (coalesced).
        assert batcher.items_run == 6
        assert batcher.batches_run < 6
    finally:
        batcher.close()
        service._batcher = None


def test_micro_batcher_error_propagates():
    from mae_clip_tpu.serve import MicroBatcher

    def boom(items):
        raise RuntimeError("bad batch")

    b = MicroBatcher(boom, max_batch=4, max_wait_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="bad batch"):
            b.submit(("q", 1))
    finally:
        b.close()


def test_micro_batcher_respects_max_batch():
    from mae_clip_tpu.serve import MicroBatcher

    calls = []

    def fn(items):
        calls.append(len(items))
        return items

    b = MicroBatcher(fn, max_batch=2, max_wait_ms=200.0)
    try:
        import threading
        threads = [threading.Thread(target=b.submit, args=(i,))
                   for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sum(calls) == 5
        assert all(c <= 2 for c in calls)
    finally:
        b.close()


def test_micro_batching_clamps_topk_to_gallery(service):
    """max_n larger than the gallery must clamp k instead of crashing
    every /retrieve (jax top_k raises when k > rows)."""
    batcher = service.enable_micro_batching(max_batch=4, max_wait_ms=1.0,
                                            max_n=50)
    try:
        out = service.retrieve("a red square", n=100)
        assert len(out["matches"]) == len(service.gallery_names)
    finally:
        batcher.close()
        service._batcher = None


def test_quantized_gallery_matches_f32_retrieval(service):
    """quantize_gallery=True: the int8-at-rest service returns the same
    ranked matches as the f32 gallery on a separated gallery."""
    svc_q = RetrievalService(service.model, service.variables,
                             service.tokenizer, gallery=service.gallery,
                             gallery_names=service.gallery_names,
                             max_length=16, quantize_gallery=True)
    assert svc_q.gallery is None and svc_q.gallery_q.dtype == jnp.int8
    assert svc_q.gallery_size == service.gallery_size == 5

    for query in ("a red square", "a blue circle"):
        a = service.retrieve(query, n=3)
        b = svc_q.retrieve(query, n=3)
        assert a["indices"] == b["indices"]
        np.testing.assert_allclose(a["scores"], b["scores"], atol=2e-2)


def test_service_zeroshot_siglip_scoring():
    """A siglip checkpoint (logit_scale+bias params) scores labels with
    its trained sigmoid, same ranking as the softmax protocol."""
    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16,
                 contrastive_loss="siglip")
    tok = WordPieceTokenizer(build_vocab(
        ["a red square", "a blue circle"], vocab_size=64, min_frequency=1))
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=16,
                                     n_layers=1, n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    rng = np.random.default_rng(0)
    batch = {"image": jnp.array(rng.normal(size=(2, 16, 16, 3)).astype(np.float32)),
             "input_ids": jnp.array(rng.integers(0, tok.vocab_size, (2, 8)).astype(np.int32)),
             "attention_mask": jnp.ones((2, 8), dtype=jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    assert "logit_bias" in variables["params"]

    svc = RetrievalService(model, variables, tok, max_length=16)
    img = rng.normal(size=(16, 16, 3)).astype(np.float32)
    probs = svc.zeroshot(["red", "blue"], img)
    # Sigmoid probabilities: each in (0,1) but NOT summing to 1 (with the
    # init bias -10 they are all near sigmoid(-10+10*sim) << 1).
    assert set(probs) == {"red", "blue"}
    assert all(0.0 < p < 1.0 for p in probs.values())
    assert abs(sum(probs.values()) - 1.0) > 1e-3


def test_service_zeroshot_trained_temperature_scoring():
    """A learnable-temperature checkpoint (logit_scale only, no bias)
    scores labels with softmax at the TRAINED exp(s) clamped at 100 —
    not the protocol's fixed 100."""
    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16,
                 contrastive_loss="clip", learnable_temperature=True,
                 temperature=0.5)
    tok = WordPieceTokenizer(build_vocab(
        ["a red square", "a blue circle"], vocab_size=64, min_frequency=1))
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=16,
                                     n_layers=1, n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    rng = np.random.default_rng(0)
    batch = {"image": jnp.array(rng.normal(size=(2, 16, 16, 3)).astype(np.float32)),
             "input_ids": jnp.array(rng.integers(0, tok.vocab_size, (2, 8)).astype(np.int32)),
             "attention_mask": jnp.ones((2, 8), dtype=jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    assert "logit_scale" in params and "logit_bias" not in params
    # exp(s) = 1/temperature = 2 at init.
    svc = RetrievalService(model, variables, tok, max_length=16)
    img = rng.normal(size=(16, 16, 3)).astype(np.float32)
    probs = svc.zeroshot(["red", "blue"], img)
    assert abs(sum(probs.values()) - 1.0) < 1e-5      # softmax: sums to 1
    # At scale 2 the softmax is much softer than at the fixed 100: both
    # probabilities stay well inside (0.2, 0.8) for unit-norm features.
    assert all(0.2 < p < 0.8 for p in probs.values()), probs


def test_micro_batcher_queue_cap_sheds_with_overloaded():
    """max_queue bounds the waiting-item count: submits beyond it raise
    Overloaded WITHOUT being enqueued (and count in items_shed), while
    admitted requests complete normally."""
    import threading
    import time as _time

    from mae_clip_tpu.serve import MicroBatcher, Overloaded

    release = threading.Event()

    def slow_fn(items):
        release.wait(5)
        return [x * 2 for x in items]

    b = MicroBatcher(slow_fn, max_batch=1, max_wait_ms=1.0, max_queue=2)
    try:
        results, errors = [], []

        def client(x):
            try:
                results.append(b.submit(x))
            except Overloaded as e:
                errors.append(e)

        # First submit is dequeued by the worker (blocks in slow_fn);
        # then fill the 2-slot queue, then overflow it.
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
            _time.sleep(0.05)   # deterministic arrival order
        release.set()
        for t in threads:
            t.join(timeout=5)
        assert len(errors) == 3 and len(results) == 3, (results, errors)
        assert b.items_shed == 3
        assert sorted(results) == [0, 2, 4]
    finally:
        release.set()
        b.close()


def test_micro_batcher_deadline_sheds_stale_requests():
    """deadline_ms: items that waited longer than the deadline when the
    worker dequeues them are failed fast with Overloaded — they never
    cost a device call (fn sees only fresh items)."""
    import threading
    import time as _time

    from mae_clip_tpu.serve import MicroBatcher, Overloaded

    seen = []
    gate = threading.Event()

    def fn(items):
        seen.append(list(items))
        if not gate.is_set():
            gate.set()
            _time.sleep(0.4)     # make the NEXT queued item stale
        return [x * 2 for x in items]

    b = MicroBatcher(fn, max_batch=1, max_wait_ms=1.0, deadline_ms=100.0)
    try:
        out = {}

        def client(x):
            try:
                out[x] = b.submit(x)
            except Overloaded:
                out[x] = "shed"

        t1 = threading.Thread(target=client, args=(1,))
        t2 = threading.Thread(target=client, args=(2,))
        t1.start()
        gate.wait(5)          # item 1 is inside fn, holding the worker
        t2.start()            # item 2 queues and ages past 100 ms
        t1.join(timeout=5)
        t2.join(timeout=5)
        assert out[1] == 2
        assert out[2] == "shed"
        assert seen == [[1]]          # the stale item never reached fn
        assert b.items_shed == 1
    finally:
        b.close()


def test_http_503_on_overload(service):
    """The HTTP layer maps Overloaded to 503 (retryable), and /healthz
    reports shed counts."""
    import json as json_mod
    import threading
    import urllib.error
    import urllib.request

    from mae_clip_tpu.serve import (MicroBatcher, make_server,
                                    serve_forever_in_thread)

    release = threading.Event()

    def slow_fn(items):
        release.wait(5)
        return [{"matches": [], "scores": [], "indices": []}
                for _ in items]

    # Replace the service's batcher with a deliberately tiny-queue one.
    service._batcher = MicroBatcher(slow_fn, max_batch=1, max_wait_ms=1.0,
                                    max_queue=1)
    server = make_server(service)
    serve_forever_in_thread(server)
    port = server.server_address[1]
    try:
        codes = []

        def post():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/retrieve",
                data=json_mod.dumps({"query": "a dog"}).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=10) as r:
                    codes.append(r.status)
            except urllib.error.HTTPError as e:
                codes.append(e.code)

        import time as _time
        threads = [threading.Thread(target=post) for _ in range(4)]
        for t in threads:
            t.start()
            _time.sleep(0.05)
        release.set()
        for t in threads:
            t.join(timeout=10)
        assert sorted(codes) == [200, 200, 503, 503], codes

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            health = json_mod.loads(r.read())
        assert health["batcher"]["items_shed"] == 2
    finally:
        release.set()
        service._batcher.close()
        service._batcher = None
        server.shutdown()
