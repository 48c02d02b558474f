"""Retrieval + zero-shot eval: math parity vs torch oracles of the
reference protocols (inference.py:42-47, CIFAR.ipynb cell 9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from mae_clip_tpu.ops.retrieval import (l2_normalize, retrieval_topk,
                                        strided_dedup)
from mae_clip_tpu.eval.retrieval import recall_at_k
from mae_clip_tpu.eval.zeroshot import zero_shot_probs


def test_l2_normalize_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 7)).astype(np.float32)
    ours = np.asarray(l2_normalize(jnp.array(x)))
    theirs = F.normalize(torch.tensor(x), p=2, dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_retrieval_topk_matches_torch_topk():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    g = rng.normal(size=(50, 16)).astype(np.float32)
    scores, idx = retrieval_topk(jnp.array(q), jnp.array(g), k=10)

    qn = F.normalize(torch.tensor(q), p=2, dim=-1)
    gn = F.normalize(torch.tensor(g), p=2, dim=-1)
    t_scores, t_idx = torch.topk(qn @ gn.T, 10)
    np.testing.assert_allclose(np.asarray(scores), t_scores.numpy(),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), t_idx.numpy())


def test_retrieval_topk_chunked_equals_unchunked():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    g = rng.normal(size=(1000, 8)).astype(np.float32)
    s1, i1 = retrieval_topk(jnp.array(q), jnp.array(g), k=7,
                            chunk_size=4096)   # single-shot path
    s2, i2 = retrieval_topk(jnp.array(q), jnp.array(g), k=7,
                            chunk_size=128)    # scan path, ragged last chunk
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def test_strided_dedup_reference_semantics():
    """indices[::5][:n] — skip the 5 duplicate captions per image."""
    idx = jnp.arange(45)[None, :]
    picked = strided_dedup(idx, n=9, stride=5)
    np.testing.assert_array_equal(np.asarray(picked)[0],
                                  np.arange(0, 45, 5))


def test_recall_at_k_perfect_and_random():
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(20, 8)).astype(np.float32)
    # Perfect: text embedding == its image embedding.
    out = recall_at_k(jnp.array(emb), jnp.array(emb), np.arange(20),
                      ks=(1, 5))
    assert out["recall@1"] == 1.0
    assert out["recall@5"] == 1.0
    # Wrong mapping: recall@1 nearly always 0.
    out2 = recall_at_k(jnp.array(emb), jnp.array(emb),
                       np.roll(np.arange(20), 1), ks=(1,))
    assert out2["recall@1"] == 0.0


def test_zero_shot_probs_matches_reference_math():
    rng = np.random.default_rng(4)
    img = rng.normal(size=(2, 16)).astype(np.float32)
    cls = rng.normal(size=(10, 16)).astype(np.float32)
    cls_n = np.asarray(l2_normalize(jnp.array(cls)))
    ours = np.asarray(zero_shot_probs(jnp.array(img), jnp.array(cls_n)))

    img_t = F.normalize(torch.tensor(img), p=2, dim=-1)
    cls_t = torch.tensor(cls_n)
    theirs = (100.0 * img_t @ cls_t.T).softmax(dim=-1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    np.testing.assert_allclose(ours.sum(-1), 1.0, atol=1e-5)


def test_end_to_end_retrieval_with_tiny_model():
    """find_matches through a real (tiny) model + tokenizer."""
    from mae_clip_tpu.config import Config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
    from mae_clip_tpu.eval.retrieval import (compute_image_embeddings,
                                             find_matches)

    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16)
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=64, dim=16, n_layers=1,
                                     n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.array(rng.normal(size=(4, 16, 16, 3)).astype(np.float32)),
        "input_ids": jnp.array(rng.integers(0, 64, (4, 8)).astype(np.int32)),
        "attention_mask": jnp.ones((4, 8), dtype=jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)

    loader = [{"image": np.asarray(batch["image"]),
               "valid": np.array([True, True, True, False])}]
    gallery = compute_image_embeddings(model, variables, loader)
    assert gallery.shape == (3, 8)   # invalid row dropped

    vocab = build_vocab(["a red thing", "a blue thing"], vocab_size=64,
                        min_frequency=1)
    tok = WordPieceTokenizer(vocab)
    names = ["a.jpg", "b.jpg", "c.jpg"]
    matches = find_matches(model, variables, gallery, "a red thing", names,
                           tok, n=2, dedup_stride=1)
    assert len(matches) == 2
    assert set(matches) <= set(names)


def test_make_retrieval_eval_fn_end_to_end():
    """Per-epoch recall@K hook over a tiny in-memory dataset."""
    from mae_clip_tpu.config import Config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.eval.retrieval import make_retrieval_eval_fn
    from mae_clip_tpu.train.loop import Trainer

    captions = [f"object number {i}" for i in range(6)]
    # 2 captions per image: filenames repeated (reference gallery layout).
    filenames = [f"{i // 2}.jpg" for i in range(6)]
    tok = WordPieceTokenizer(build_vocab(captions, vocab_size=64,
                                         min_frequency=1))
    images = np.random.default_rng(0).normal(
        size=(6, 16, 16, 3)).astype(np.float32)
    ds = CaptionDataset(filenames, captions, tok, size=16, max_length=16)

    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16, batch_size=4)
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=16,
                                     n_layers=1, n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    batch = next(make_loader(ds, 4, images=images, num_threads=1))
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch.items()})
    trainer = Trainer(cfg, model, variables["params"])

    eval_fn = make_retrieval_eval_fn(
        model, ds,
        lambda d, b: make_loader(d, b, images=images, num_threads=1),
        batch_size=4, ks=(1, 3), max_samples=None)
    out = eval_fn(trainer, 0)
    assert set(out) == {"eval/recall@1", "eval/recall@3"}
    assert 0.0 <= out["eval/recall@1"] <= out["eval/recall@3"] <= 1.0


def test_evaluate_retrieval_bidirectional():
    """Standalone bidirectional eval: matches a numpy oracle computed from
    the same embeddings, and is exact on a perfectly-aligned toy model."""
    from mae_clip_tpu.config import Config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.eval.retrieval import (compute_image_embeddings,
                                             evaluate_retrieval)

    captions = [f"object number {i}" for i in range(6)]
    filenames = [f"{i // 2}.jpg" for i in range(6)]   # 2 captions per image
    tok = WordPieceTokenizer(build_vocab(captions, vocab_size=64,
                                         min_frequency=1))
    images = np.random.default_rng(0).normal(
        size=(6, 16, 16, 3)).astype(np.float32)
    ds = CaptionDataset(filenames, captions, tok, size=16, max_length=16)

    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16, batch_size=4)
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=16,
                                     n_layers=1, n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    batch = next(make_loader(ds, 4, images=images, num_threads=1))
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch.items()})

    make_loader_fn = lambda d, b: make_loader(d, b, images=images,
                                              num_threads=1)
    out = evaluate_retrieval(model, variables, ds, make_loader_fn,
                             batch_size=4, ks=(1, 3))
    assert out["num_images"] == 3.0 and out["num_captions"] == 6.0
    for k in (1, 3):
        assert 0.0 <= out[f"t2i_recall@{k}"] <= 1.0
        assert 0.0 <= out[f"i2t_recall@{k}"] <= 1.0
    assert out["t2i_recall@1"] <= out["t2i_recall@3"]
    assert out["i2t_recall@1"] <= out["i2t_recall@3"]

    # Numpy oracle from the same embeddings.
    row_emb = np.asarray(compute_image_embeddings(
        model, variables, make_loader_fn(ds, 4)))
    feats = model.apply(variables, jnp.asarray(ds.input_ids),
                        jnp.asarray(ds.attention_mask),
                        method=model.encode_text)
    text_emb = np.asarray(model.apply(variables, feats,
                                      method=model.project_text))
    norm = lambda a: a / np.linalg.norm(a, axis=-1, keepdims=True)
    names = np.asarray(ds.image_filenames)
    uniq = names[[0, 2, 4]]
    sims = norm(text_emb) @ norm(row_emb[[0, 2, 4]]).T
    top1 = uniq[np.argmax(sims, axis=1)]
    expected_t2i_r1 = float((top1 == names).mean())
    assert np.isclose(out["t2i_recall@1"], expected_t2i_r1)
    sims_i2t = norm(row_emb[[0, 2, 4]]) @ norm(text_emb).T
    top1_cap = names[np.argmax(sims_i2t, axis=1)]
    expected_i2t_r1 = float((top1_cap == uniq).mean())
    assert np.isclose(out["i2t_recall@1"], expected_i2t_r1)


def test_zero_shot_accuracy_and_dir_eval(tmp_path):
    """zero_shot_accuracy vs a numpy oracle on the same embeddings, and the
    class-per-subdirectory evaluator end to end (ragged tail masked)."""
    import cv2

    from mae_clip_tpu.config import Config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
    from mae_clip_tpu.eval.zeroshot import (build_zero_shot_classifier,
                                            zero_shot_accuracy,
                                            zero_shot_dir_eval,
                                            zero_shot_probs)

    classes = ["red", "green", "blue"]
    tok = WordPieceTokenizer(build_vocab(
        [f"a photo of a {c}" for c in classes], vocab_size=64,
        min_frequency=1))
    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16, batch_size=4)
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=16,
                                     n_layers=1, n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    rng = np.random.default_rng(0)
    init_batch = {
        "image": jnp.asarray(rng.normal(size=(4, 16, 16, 3)),
                             jnp.float32),
        "input_ids": jnp.asarray(rng.integers(0, tok.vocab_size,
                                              size=(4, 8)), jnp.int32),
        "attention_mask": jnp.ones((4, 8), jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), init_batch)

    classifier = build_zero_shot_classifier(model, variables, tok, classes)
    # 7 images across 3 classes (ragged vs batch 4) -> 2 batches w/ padding.
    images = rng.normal(size=(7, 16, 16, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 0, 1, 2, 0])

    def loader():
        for s in range(0, 7, 4):
            img, lab = images[s:s + 4], labels[s:s + 4]
            valid = np.ones(len(img), dtype=bool)
            if len(img) < 4:
                pad = 4 - len(img)
                img = np.concatenate([img, np.zeros((pad, 16, 16, 3),
                                                    np.float32)])
                lab = np.concatenate([lab, np.zeros(pad, lab.dtype)])
                valid = np.concatenate([valid, np.zeros(pad, bool)])
            yield {"image": img, "label": lab, "valid": valid}

    out = zero_shot_accuracy(model, variables, loader(), classifier,
                             ks=(1, 2))

    # Oracle: probs on the 7 real images.
    feats = model.apply(variables, jnp.asarray(images),
                        method=model.encode_image)
    emb = model.apply(variables, feats, method=model.project_image)
    probs = np.asarray(zero_shot_probs(emb, classifier))
    top1 = probs.argmax(axis=1)
    assert np.isclose(out["top1_accuracy"], (top1 == labels).mean())
    order = np.argsort(-probs, axis=1)
    top2_hit = (order[:, :2] == labels[:, None]).any(axis=1)
    assert np.isclose(out["top2_accuracy"], top2_hit.mean())

    # Directory evaluator end to end (writes real image files).
    for ci, c in enumerate(classes):
        d = tmp_path / c
        d.mkdir()
        for j in range(2):
            img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(d / f"{j}.png"), img)
    res = zero_shot_dir_eval(model, variables, tok, str(tmp_path), size=16,
                             batch_size=4, ks=(1,))
    assert res["num_images"] == 6.0 and res["num_classes"] == 3.0
    assert 0.0 <= res["top1_accuracy"] <= 1.0


def test_cifar10_pickle_loader_and_eval(tmp_path):
    """Offline cifar-10-batches-py parsing (torchvision's on-disk format,
    the reference CIFAR.ipynb cell 6 input) + the full zero-shot protocol
    over it. Synthesizes a tiny dump: CHW plane-order rows, bytes keys,
    batches.meta label_names."""
    import pickle

    from mae_clip_tpu.config import Config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
    from mae_clip_tpu.eval.zeroshot import (load_cifar10_pickle,
                                            zero_shot_cifar_eval)

    rng = np.random.default_rng(7)
    n_test, n_train_per = 9, 4
    names = [f"class{i}" for i in range(10)]

    def write_batch(path, n, seed):
        r = np.random.default_rng(seed)
        imgs = r.integers(0, 256, size=(n, 32, 32, 3)).astype(np.uint8)
        rows = imgs.transpose(0, 3, 1, 2).reshape(n, 3072)  # HWC -> CHW rows
        labels = r.integers(0, 10, size=n).tolist()
        with open(path, "wb") as fh:
            pickle.dump({b"data": rows, b"labels": labels}, fh)
        return imgs, labels

    test_imgs, test_labels = write_batch(tmp_path / "test_batch", n_test, 1)
    train_parts = [write_batch(tmp_path / f"data_batch_{i}", n_train_per,
                               10 + i) for i in range(1, 6)]
    with open(tmp_path / "batches.meta", "wb") as fh:
        pickle.dump({b"label_names": [n.encode() for n in names]}, fh)

    imgs, labels, classes = load_cifar10_pickle(str(tmp_path), "test")
    np.testing.assert_array_equal(imgs, test_imgs)       # exact round-trip
    np.testing.assert_array_equal(labels, test_labels)
    assert classes == names
    tr_imgs, tr_labels, _ = load_cifar10_pickle(str(tmp_path), "train")
    assert tr_imgs.shape == (5 * n_train_per, 32, 32, 3)
    np.testing.assert_array_equal(tr_imgs[:n_train_per], train_parts[0][0])

    tok = WordPieceTokenizer(build_vocab(
        [f"a photo of a {c}" for c in names], vocab_size=96,
        min_frequency=1))
    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16, batch_size=4)
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=16,
                                     n_layers=1, n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    init_batch = {
        "image": jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(0, tok.vocab_size, (4, 8)),
                                 jnp.int32),
        "attention_mask": jnp.ones((4, 8), jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), init_batch)

    out = zero_shot_cifar_eval(model, variables, tok, str(tmp_path),
                               size=16, batch_size=4)
    assert out["num_images"] == n_test and out["num_classes"] == 10
    assert 0.0 <= out["top1_accuracy"] <= out["top5_accuracy"] <= 1.0


def test_zero_shot_template_ensembling():
    """Prompt ensembling (CLIP paper §3.1.4): list-of-one == single string;
    a two-template ensemble equals the manually averaged-and-renormalized
    per-template classifiers."""
    from mae_clip_tpu.config import Config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
    from mae_clip_tpu.eval.zeroshot import build_zero_shot_classifier
    from mae_clip_tpu.ops.retrieval import l2_normalize

    classes = ["red", "green", "blue"]
    t1, t2 = "a photo of a {}", "an image of a {}"
    tok = WordPieceTokenizer(build_vocab(
        [t.format(c) for c in classes for t in (t1, t2)], vocab_size=64,
        min_frequency=1))
    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16, batch_size=4)
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=16,
                                     n_layers=1, n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    rng = np.random.default_rng(1)
    init_batch = {
        "image": jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(0, tok.vocab_size,
                                              size=(4, 8)), jnp.int32),
        "attention_mask": jnp.ones((4, 8), jnp.int32)}
    variables = model.init(jax.random.PRNGKey(0), init_batch)

    single = build_zero_shot_classifier(model, variables, tok, classes,
                                        template=t1)
    listed = build_zero_shot_classifier(model, variables, tok, classes,
                                        template=[t1])
    np.testing.assert_allclose(np.asarray(listed), np.asarray(single),
                               atol=1e-6)

    both = build_zero_shot_classifier(model, variables, tok, classes,
                                      template=[t1, t2])
    a = build_zero_shot_classifier(model, variables, tok, classes,
                                   template=t1)
    b = build_zero_shot_classifier(model, variables, tok, classes,
                                   template=t2)
    manual = l2_normalize((jnp.asarray(a) + jnp.asarray(b)) / 2.0)
    np.testing.assert_allclose(np.asarray(both), np.asarray(manual),
                               atol=1e-5)
    assert not np.allclose(np.asarray(both), np.asarray(single))


def test_int8_gallery_quantization_and_topk():
    """quantize_embeddings bounds per-component error at ~scale/2 and
    retrieval_topk_int8 reproduces exact top-1 (both the single-matmul and
    the chunked-scan paths)."""
    from mae_clip_tpu.ops.retrieval import (dequantize_embeddings,
                                            l2_normalize,
                                            quantize_embeddings,
                                            retrieval_topk,
                                            retrieval_topk_int8)

    rng = np.random.default_rng(5)
    gallery = np.asarray(l2_normalize(
        jnp.asarray(rng.normal(size=(200, 32)).astype(np.float32))))
    q8, scales = quantize_embeddings(jnp.asarray(gallery))
    assert q8.dtype == jnp.int8 and scales.shape == (200,)
    deq = np.asarray(dequantize_embeddings(q8, scales))
    err = np.abs(deq - gallery)
    assert err.max() <= float(np.max(np.asarray(scales))) / 2 + 1e-6

    # queries = noisy copies of gallery rows -> exact top-1 must survive
    picks = rng.integers(0, 200, size=16)
    queries = gallery[picks] + 0.01 * rng.normal(size=(16, 32)).astype(
        np.float32)
    _, exact = retrieval_topk(jnp.asarray(queries), jnp.asarray(gallery),
                              k=5)
    for chunk in (8192, 64):     # single-matmul and scan paths
        _, qi = retrieval_topk_int8(jnp.asarray(queries), q8, scales, k=5,
                                    chunk_size=chunk)
        np.testing.assert_array_equal(np.asarray(qi)[:, 0],
                                      np.asarray(exact)[:, 0])
        np.testing.assert_array_equal(np.asarray(qi)[:, 0], picks)


def test_siglip_zero_shot_probs_formula_and_ranking():
    """sigmoid(exp(s)·sim + b) per class, same ranking as the softmax
    protocol (sigmoid is monotone in sim)."""
    from mae_clip_tpu.eval.zeroshot import siglip_zero_shot_probs

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(3, 16)).astype(np.float32)
    cls = rng.normal(size=(5, 16)).astype(np.float32)
    cls_n = cls / np.linalg.norm(cls, axis=-1, keepdims=True)
    s, b = 1.2, -4.0

    got = np.asarray(siglip_zero_shot_probs(
        jnp.array(emb), jnp.array(cls_n), jnp.asarray(s, jnp.float32),
        jnp.asarray(b, jnp.float32)))
    emb_n = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    sim = emb_n @ cls_n.T
    expected = 1.0 / (1.0 + np.exp(-(np.exp(s) * sim + b)))
    np.testing.assert_allclose(got, expected, atol=1e-5)
    # Per-row ranking identical to the softmax protocol.
    soft = np.asarray(zero_shot_probs(jnp.array(emb), jnp.array(cls_n)))
    np.testing.assert_array_equal(np.argsort(-got, axis=1),
                                  np.argsort(-soft, axis=1))


def test_retrieval_eval_fn_cached_text_matches_tokens_path():
    """The per-epoch hook fed the LiT frozen-text feature cache
    (text_features=) must reproduce the full-tower path's recalls: with a
    frozen eval-mode text tower, project_text(cached_features) IS
    encode_text->project_text (the train step's cached branch,
    models/clip.py text_features path)."""
    from mae_clip_tpu.config import Config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.eval.retrieval import make_retrieval_eval_fn
    from mae_clip_tpu.train.loop import Trainer, precompute_text_features

    captions = [f"object number {i}" for i in range(6)]
    filenames = [f"{i // 2}.jpg" for i in range(6)]
    tok = WordPieceTokenizer(build_vocab(captions, vocab_size=64,
                                         min_frequency=1))
    images = np.random.default_rng(0).normal(
        size=(6, 16, 16, 3)).astype(np.float32)
    ds = CaptionDataset(filenames, captions, tok, size=16, max_length=16)

    cfg = Config(model_name="vit_s16", projection_dim=8, size=16,
                 compute_dtype="float32", max_length=16, batch_size=4,
                 text_trainable=False, frozen_text_eval_mode=True)
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=tok.vocab_size, dim=16,
                                     n_layers=1, n_heads=2, hidden_dim=32,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=16, patch_size=8, dim=16, depth=1,
                             n_heads=2))
    batch = next(make_loader(ds, 4, images=images, num_threads=1))
    variables = model.init(jax.random.PRNGKey(0),
                           {k: jnp.asarray(v) for k, v in batch.items()})
    trainer = Trainer(cfg, model, variables["params"])
    loader_fn = lambda d, b: make_loader(d, b, images=images, num_threads=1)

    full = make_retrieval_eval_fn(model, ds, loader_fn, batch_size=4,
                                  ks=(1, 3), max_samples=None)(trainer, 0)
    tf = precompute_text_features(model, variables, ds)
    cached = make_retrieval_eval_fn(model, ds, loader_fn, batch_size=4,
                                    ks=(1, 3), max_samples=None,
                                    text_features=tf)(trainer, 0)
    # approx, not exact equality: the two paths batch the text encode
    # differently (precompute pads all 6 captions in one call; the full
    # path encodes in loader batches of 4), so scores agree only up to
    # XLA fusion/padding numerics — near-tied similarities could flip
    # top-k order on another platform (advisor finding, round 4).
    assert set(cached) == set(full)
    for k in full:
        assert cached[k] == pytest.approx(full[k], abs=1e-6)
