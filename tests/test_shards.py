"""Sharded tar datasets: write/read roundtrip, determinism, multi-host
partitioning, and batch parity with the in-memory loader."""

import numpy as np
import pytest

from mae_clip_tpu.data.shards import (iter_shard_records, make_shard_loader,
                                      shard_plan, write_shards)
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab


@pytest.fixture()
def dataset(tmp_path):
    import cv2
    rng = np.random.default_rng(0)
    records = []
    for i in range(23):
        p = tmp_path / f"img{i}.png"
        cv2.imwrite(str(p), rng.integers(0, 255, size=(20, 20, 3)
                                         ).astype(np.uint8))
        records.append((str(p), f"caption number {i}"))
    shard_dir = tmp_path / "shards"
    paths = write_shards(records, str(shard_dir), shard_size=5)
    return records, str(shard_dir / "shard-*.tar"), paths


def test_write_and_read_roundtrip(dataset):
    records, pattern, paths = dataset
    assert len(paths) == 5          # ceil(23 / 5)
    seen = []
    for p in paths:
        for key, img_bytes, caption in iter_shard_records(p):
            seen.append((int(key), caption))
    assert sorted(seen) == [(i, f"caption number {i}") for i in range(23)]
    # Image bytes roundtrip exactly (tar stores the original file).
    first = next(iter_shard_records(paths[0]))
    assert first[1] == open(records[int(first[0])][0], "rb").read()


def test_shard_plan_partitions_and_is_deterministic(dataset):
    _, pattern, paths = dataset
    plans = [shard_plan(pattern, host_id=h, num_hosts=2, seed=1, epoch=3)
             for h in range(2)]
    assert sorted(plans[0] + plans[1]) == sorted(paths)   # disjoint cover
    assert not set(plans[0]) & set(plans[1])
    again = shard_plan(pattern, host_id=0, num_hosts=2, seed=1, epoch=3)
    assert again == plans[0]
    other_epoch = shard_plan(pattern, host_id=0, num_hosts=2, seed=1,
                             epoch=4)
    assert other_epoch != plans[0]   # reshuffled per epoch


def test_shard_loader_batches(dataset):
    records, pattern, _ = dataset
    tok = WordPieceTokenizer(build_vocab(
        [c for _, c in records], vocab_size=64, min_frequency=1))
    batches = list(make_shard_loader(pattern, tok, batch_size=4,
                                     fixed_length=8, size=16))
    assert len(batches) == 6         # ceil(23 / 4)
    for b in batches:
        assert b["image"].shape == (4, 16, 16, 3)
        assert b["input_ids"].shape == (4, 8)
        assert b["valid"].shape == (4,)
    assert int(sum(b["valid"].sum() for b in batches)) == 23
    assert batches[-1]["valid"].tolist() == [True, True, True, False]

    # Determinism + epoch reshuffle.
    again = list(make_shard_loader(pattern, tok, batch_size=4,
                                   fixed_length=8, size=16))
    np.testing.assert_array_equal(batches[0]["image"], again[0]["image"])
    other = list(make_shard_loader(pattern, tok, batch_size=4,
                                   fixed_length=8, size=16, epoch=1))
    assert not np.array_equal(batches[0]["image"], other[0]["image"])

    # drop_last drops only the ragged tail.
    dropped = list(make_shard_loader(pattern, tok, batch_size=4,
                                     fixed_length=8, size=16,
                                     drop_last=True))
    assert len(dropped) == 5


def test_shard_loader_matches_direct_pipeline(dataset):
    """A shard-streamed record preprocesses identically to the in-memory
    CaptionDataset path on the same file."""
    from mae_clip_tpu.data.images import decode_image, host_preprocess

    records, pattern, paths = dataset
    tok = WordPieceTokenizer(build_vocab(
        [c for _, c in records], vocab_size=64, min_frequency=1))
    batch = next(make_shard_loader(pattern, tok, batch_size=23,
                                   fixed_length=8, size=16))
    # Identify each row by caption via re-tokenizing reference captions.
    key, img_bytes, caption = next(iter_shard_records(
        shard_plan(pattern, seed=0, epoch=0)[0],
        order_seed=0 * 1000003 + 0 * 101 + 0))
    want = host_preprocess(decode_image(records[int(key)][0]), 16)
    np.testing.assert_allclose(batch["image"][0], want, atol=1e-6)


def test_multi_host_streams_cover_all_records(dataset):
    records, pattern, _ = dataset
    tok = WordPieceTokenizer(build_vocab(
        [c for _, c in records], vocab_size=64, min_frequency=1))
    counts = 0
    for h in range(2):
        for b in make_shard_loader(pattern, tok, batch_size=4,
                                   fixed_length=8, size=16,
                                   host_id=h, num_hosts=2, seed=7):
            counts += int(b["valid"].sum())
    assert counts == 23


def test_shard_loader_native_patchify_path(tmp_path):
    """raw_uint8+patchify shard batches use the native C++ fused decoder
    when built, within JPEG-decoder tolerance of the python path."""
    import cv2

    from mae_clip_tpu.data import native_images

    if not native_images.native_available():
        pytest.skip("native imagepipe not built")
    rng = np.random.default_rng(4)
    records = []
    for i in range(4):
        p = tmp_path / f"{i}.jpg"
        # Smooth gradient + mild noise: pure noise is the worst case for
        # the native DCT-scaled decode and not representative of photos.
        yy, xx = np.mgrid[0:32, 0:32]
        img = np.stack([yy * 8, xx * 8, (yy + xx) * 4], -1).astype(float)
        img += rng.normal(0, 4, size=img.shape)
        cv2.imwrite(str(p), np.clip(img, 0, 255).astype(np.uint8))
        records.append((str(p), f"cap {i}"))
    pattern = str(tmp_path / "s" / "shard-*.tar")
    write_shards(records, str(tmp_path / "s"), shard_size=4)
    tok = WordPieceTokenizer(build_vocab([c for _, c in records],
                                         vocab_size=32, min_frequency=1))

    native = next(make_shard_loader(pattern, tok, batch_size=4,
                                    fixed_length=4, size=16,
                                    patchify_size=8, raw_uint8=True))
    assert native["image"].dtype == np.uint8
    assert native["image"].shape == (4, 4, 8 * 8 * 3)
    # Python-path reference on the same decoded bytes.
    import mae_clip_tpu.data.shards as shards_mod
    orig = native_images.native_available
    try:
        native_images.native_available = lambda: False
        python = next(make_shard_loader(pattern, tok, batch_size=4,
                                        fixed_length=4, size=16,
                                        patchify_size=8, raw_uint8=True))
    finally:
        native_images.native_available = orig
    diff = np.abs(native["image"].astype(int) - python["image"].astype(int))
    # Same budget as tests/test_native_images.py: DCT-scaled decode
    # resamples slightly differently from decode-then-resize.
    assert np.mean(diff) < 3.0 and np.percentile(diff, 99) <= 12, (
        np.mean(diff), np.percentile(diff, 99))


def test_shard_record_count_and_host_batch_counts(tmp_path):
    """shard_record_count reads tar headers only and matches the real
    record count; host_batch_counts reproduces each host's batch count
    from any host (deterministic, coordination-free)."""
    import cv2

    from mae_clip_tpu.data.shards import (host_batch_counts,
                                          iter_shard_records,
                                          make_shard_loader,
                                          shard_plan,
                                          shard_record_count, write_shards)
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    records, caps = [], []
    for i in range(15):
        p = str(img_dir / f"im{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (40, 40, 3)).astype(np.uint8))
        records.append((p, f"caption number {i}"))
        caps.append(f"caption number {i}")
    paths = write_shards(records, str(tmp_path / "shards"), shard_size=3)
    assert len(paths) == 5
    pattern = str(tmp_path / "shards" / "shard-*.tar")

    for p in paths:
        assert shard_record_count(p) == len(list(iter_shard_records(p))) == 3

    counts = host_batch_counts(pattern, batch_size=4, num_hosts=2,
                               seed=1, epoch=0)
    # 3-vs-2 shard strided split -> 9 vs 6 records -> 3 vs 2 batches.
    assert sorted(counts) == [2, 3]

    # Each count matches what the host's own loader actually yields.
    tok = WordPieceTokenizer(build_vocab(caps, vocab_size=64))
    for host in range(2):
        got = list(make_shard_loader(pattern, tok, batch_size=4,
                                     fixed_length=8, size=32,
                                     host_id=host, num_hosts=2,
                                     seed=1, epoch=0))
        n_records = sum(
            shard_record_count(s)
            for s in shard_plan(pattern, host, 2, seed=1, epoch=0))
        assert len(got) == counts[host] == -(-n_records // 4)

    # pad_to_batches equalizes: the short host emits all-padding batches
    # with identical static shapes.
    pad_to = max(counts)
    for host in range(2):
        got = list(make_shard_loader(pattern, tok, batch_size=4,
                                     fixed_length=8, size=32,
                                     host_id=host, num_hosts=2,
                                     seed=1, epoch=0,
                                     pad_to_batches=pad_to))
        assert len(got) == pad_to
        assert sum(int(b["valid"].sum()) for b in got) == \
            sum(shard_record_count(s)
                for s in shard_plan(pattern, host, 2, seed=1, epoch=0))
        for b in got:
            assert b["image"].shape == got[0]["image"].shape
            assert b["input_ids"].shape == (4, 8)
            assert (b["attention_mask"][:, 0] == 1).all()
