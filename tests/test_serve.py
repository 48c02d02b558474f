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
