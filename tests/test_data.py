"""Data adapters and the static-shape loader."""

import json

import numpy as np
import pytest

from mae_clip_tpu.data.coco import (coco_captions_records,
                                    get_coco_captions_df,
                                    get_coco_captions_test_df)
from mae_clip_tpu.data.flickr import make_train_valid_dfs
from mae_clip_tpu.data.images import (IMAGENET_MEAN, IMAGENET_STD,
                                      device_preprocess, host_preprocess)
from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab


@pytest.fixture(scope="module")
def coco_json(tmp_path_factory):
    doc = {
        "images": [{"id": 1, "file_name": "img1.jpg"},
                   {"id": 2, "file_name": "img2.jpg"}],
        "annotations": [
            {"image_id": 1, "caption": "a dog"},
            {"image_id": 2, "caption": "a cat"},
            {"image_id": 1, "caption": "another dog"},
        ],
    }
    p = tmp_path_factory.mktemp("coco") / "captions.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_coco_records_flatten_per_caption(coco_json):
    recs = coco_captions_records(coco_json)
    assert recs == [("img1.jpg", "a dog"), ("img2.jpg", "a cat"),
                    ("img1.jpg", "another dog")]


def test_coco_df_reference_columns(coco_json):
    df = get_coco_captions_df(coco_json)
    assert list(df.columns) == ["image", "caption"]
    assert len(df) == 3
    assert df["image"].tolist() == ["img1.jpg", "img2.jpg", "img1.jpg"]
    test_df = get_coco_captions_test_df(coco_json, length=2)
    assert len(test_df) == 2


def test_flickr_split_seed42(tmp_path):
    import pandas as pd
    n_images, caps_per = 50, 2
    rows = [{"id": i, "image": f"{i}.jpg", "caption": f"cap {i} {j}"}
            for i in range(n_images) for j in range(caps_per)]
    pd.DataFrame(rows).to_csv(tmp_path / "captions.csv", index=False)

    train_df, valid_df = make_train_valid_dfs(str(tmp_path))

    # Independent oracle of the reference algorithm (main.py:20-31).
    max_id = n_images - 1 + 1
    ids = np.arange(0, max_id)
    np.random.seed(42)
    valid_ids = set(np.random.choice(ids, size=int(0.2 * len(ids)),
                                     replace=False).tolist())
    assert set(valid_df["id"]) == valid_ids
    assert set(train_df["id"]) == set(ids.tolist()) - valid_ids
    assert len(train_df) + len(valid_df) == len(rows)
    # Split is deterministic across calls.
    t2, v2 = make_train_valid_dfs(str(tmp_path))
    assert t2["id"].tolist() == train_df["id"].tolist()


def test_host_preprocess_matches_reference_math():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(224, 224, 3)).astype(np.uint8)
    out = host_preprocess(img, size=224)  # no resize needed
    expected = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_device_preprocess_matches_host():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(2, 224, 224, 3)).astype(np.uint8)
    dev = np.asarray(device_preprocess(img, 224))
    host = np.stack([host_preprocess(img[i], 224) for i in range(2)])
    np.testing.assert_allclose(dev, host, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_dataset():
    captions = [f"a photo of thing {i}" for i in range(10)]
    vocab = build_vocab(captions, vocab_size=64, min_frequency=1)
    tok = WordPieceTokenizer(vocab)
    images = np.random.default_rng(0).normal(
        size=(10, 8, 8, 3)).astype(np.float32)
    ds = CaptionDataset([f"{i}.jpg" for i in range(10)], captions, tok,
                        size=8, max_length=16)
    return ds, images


def test_loader_static_shapes_and_ragged_tail(tiny_dataset):
    ds, images = tiny_dataset
    batches = list(make_loader(ds, batch_size=4, images=images,
                               num_threads=1))
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (4, 8, 8, 3)       # static
        assert b["input_ids"].shape[0] == 4
        assert b["valid"].shape == (4,)
    assert batches[0]["valid"].sum() == 4
    assert batches[2]["valid"].sum() == 2             # ragged tail masked
    # Pad rows keep one valid attention token (no all-masked softmax rows).
    assert batches[2]["attention_mask"][2:].sum(axis=1).min() >= 1


def test_loader_covers_all_samples_once(tiny_dataset):
    ds, images = tiny_dataset
    seen = []
    for b in make_loader(ds, batch_size=4, images=images, num_threads=1):
        v = b["valid"]
        seen.extend(b["input_ids"][v][:, :8].tolist())
    assert len(seen) == 10


def test_loader_shuffle_deterministic(tiny_dataset):
    ds, images = tiny_dataset
    a = [b["input_ids"].tolist() for b in
         make_loader(ds, batch_size=4, shuffle=True, seed=7, images=images,
                     num_threads=1)]
    b_ = [b["input_ids"].tolist() for b in
          make_loader(ds, batch_size=4, shuffle=True, seed=7, images=images,
                      num_threads=1)]
    c = [b["input_ids"].tolist() for b in
         make_loader(ds, batch_size=4, shuffle=True, seed=8, images=images,
                     num_threads=1)]
    assert a == b_
    assert a != c


def test_loader_threaded_prefetch_equals_serial(tiny_dataset):
    ds, images = tiny_dataset
    serial = [b["input_ids"].tolist() for b in
              make_loader(ds, batch_size=4, images=images, num_threads=1)]
    threaded = [b["input_ids"].tolist() for b in
                make_loader(ds, batch_size=4, images=images, num_threads=4)]
    assert serial == threaded


def test_loader_drop_last(tiny_dataset):
    ds, images = tiny_dataset
    batches = list(make_loader(ds, batch_size=4, drop_last=True,
                               images=images, num_threads=1))
    assert len(batches) == 2
    assert all(b["valid"].all() for b in batches)


def test_loader_multihost_partitions_global_batch(tiny_dataset):
    ds, images = tiny_dataset
    single = list(make_loader(ds, batch_size=4, images=images,
                              num_threads=1))
    host0 = list(make_loader(ds, batch_size=4, images=images, num_threads=1,
                             host_id=0, num_hosts=2))
    host1 = list(make_loader(ds, batch_size=4, images=images, num_threads=1,
                             host_id=1, num_hosts=2))
    assert len(host0) == len(host1) == len(single)
    for s, a, b in zip(single, host0, host1):
        assert a["image"].shape[0] == 2 and b["image"].shape[0] == 2
        merged_ids = np.concatenate([a["input_ids"], b["input_ids"]])
        np.testing.assert_array_equal(merged_ids, s["input_ids"])
        merged_valid = np.concatenate([a["valid"], b["valid"]])
        np.testing.assert_array_equal(merged_valid, s["valid"])


def test_image_cache_dedupes_by_filename(tmp_path):
    """cache=True: each unique FILE decodes once; repeat rows and repeat
    epochs hit host RAM (Config.cache_images; BASELINE.md end-to-end
    epoch measurement)."""
    import cv2

    from mae_clip_tpu.data.pipeline import ImageFileSource

    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"im{i}.png"), img)
    # two caption rows share im0.png
    names = ["im0.png", "im1.png", "im2.png", "im0.png"]
    src = ImageFileSource(names, image_path=str(tmp_path), size=8,
                          cache=True)
    decodes = []
    orig = ImageFileSource._load_path

    def counting(self, path, aug_rng):
        decodes.append(path)
        return orig(self, path, aug_rng)

    ImageFileSource._load_path = counting
    try:
        first = [src.load_image(i) for i in range(4)]
        second = [src.load_image(i) for i in range(4)]   # "epoch 2"
    finally:
        ImageFileSource._load_path = orig
    assert len(decodes) == 3                 # unique files, once each
    np.testing.assert_array_equal(first[0], first[3])    # shared file
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)
    # uncached source decodes every call
    src2 = ImageFileSource(names, image_path=str(tmp_path), size=8)
    ImageFileSource._load_path = counting
    try:
        decodes.clear()
        [src2.load_image(i) for i in range(4)]
    finally:
        ImageFileSource._load_path = orig
    assert len(decodes) == 4


def test_make_loader_empty_host_slice(tmp_path):
    """Ragged global tail that leaves a host with ZERO rows: the loader
    must still emit a static-shape all-padding batch (valid all-False) so
    every host runs the same number of steps (multi-host lockstep), and
    the non-empty hosts' slices must be unchanged."""
    import cv2

    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    names, caps = [], []
    for i in range(20):     # batch 16, 2 hosts: tail = 4 rows, host1 empty
        name = str(img_dir / f"im{i}.jpg")
        cv2.imwrite(name, rng.integers(0, 255, (40, 40, 3)).astype(np.uint8))
        names.append(name)
        caps.append(f"a photo number {i}")
    tok = WordPieceTokenizer(build_vocab(caps, vocab_size=64))
    ds = CaptionDataset(names, caps, tok, size=32, max_length=8,
                        raw_uint8=True, patchify_size=16)

    def batches(host_id, num_hosts):
        return list(make_loader(ds, 16, host_id=host_id,
                                num_hosts=num_hosts, num_threads=1))

    single = batches(0, 1)
    h0, h1 = batches(0, 2), batches(1, 2)
    assert len(single) == len(h0) == len(h1) == 2

    # Tail batch: host0 holds the 4 real rows, host1 is all padding.
    assert h0[1]["valid"].sum() == 4 and h1[1]["valid"].sum() == 0
    for k in ("image", "input_ids", "attention_mask", "valid"):
        assert h1[1][k].shape == h0[1][k].shape
        assert h1[1][k].dtype == h0[1][k].dtype
        # Concatenated host slices == the single-host global batch.
        for b in range(2):
            np.testing.assert_array_equal(
                np.concatenate([h0[b][k], h1[b][k]]), single[b][k],
                err_msg=f"{k} batch {b}")
    # Padding rows keep the one-valid-attention-token invariant.
    assert (h1[1]["attention_mask"][:, 0] == 1).all()
