"""Sharded tar datasets: production-scale streaming input.

The reference reads one captions CSV + a flat image directory
(reference dataset.py:9-40) — fine for Flickr8k, hopeless for the
web-scale corpora a 32k-global-batch contrastive run needs. This module
adds the standard sharded-tar layout (webdataset convention: N records
per ``.tar``, each record a ``<key>.jpg`` + ``<key>.txt`` pair):

* shards are the unit of distribution — hosts take disjoint shard
  subsets, so no global index or cross-host coordination is needed;
* ordering is deterministic in (seed, epoch): shard order is a seeded
  permutation, per-shard record order a per-shard seeded permutation —
  every host computes the same global plan without communicating;
* records stream: one shard is resident at a time per worker, so memory
  is O(shard), not O(dataset);
* batches come out in this framework's standard static-shape form
  ({image, input_ids, attention_mask, valid}), captions tokenized at a
  caller-pinned ``fixed_length`` (whole-dataset pad-to-longest is
  impossible — and unnecessary — when streaming).
"""

from __future__ import annotations

import glob
import io
import os
import tarfile
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from mae_clip_tpu.data.images import decode_image_bytes
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer


def write_shards(records: Sequence[Tuple[str, str]], out_dir: str,
                 shard_size: int = 1000, prefix: str = "shard"
                 ) -> List[str]:
    """(image file path, caption) pairs -> ``out_dir/<prefix>-NNNNN.tar``.

    Returns the shard paths. Keys are zero-padded global record indices,
    so a record's identity survives re-sharding.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths: List[str] = []
    tar = None
    try:
        for i, (image_path, caption) in enumerate(records):
            if i % shard_size == 0:
                if tar is not None:
                    tar.close()
                shard_path = os.path.join(
                    out_dir, f"{prefix}-{len(paths):05d}.tar")
                paths.append(shard_path)
                tar = tarfile.open(shard_path, "w")
            key = f"{i:09d}"
            ext = os.path.splitext(image_path)[1].lstrip(".") or "jpg"
            with open(image_path, "rb") as f:
                img_bytes = f.read()
            for name, payload in ((f"{key}.{ext}", img_bytes),
                                  (f"{key}.txt", caption.encode("utf-8"))):
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tar.addfile(info, io.BytesIO(payload))
    finally:
        if tar is not None:
            tar.close()
    return paths


_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def iter_shard_records(shard_path: str,
                       order_seed: Optional[int] = None
                       ) -> Iterator[Tuple[str, bytes, str]]:
    """Yield (key, image bytes, caption) from one tar shard.

    ``order_seed`` applies a seeded permutation of the shard's records
    (the whole shard is read into memory first — shards are sized for
    that; streaming order would defeat per-epoch shuffling).
    """
    with tarfile.open(shard_path, "r") as tar:
        images: Dict[str, bytes] = {}
        texts: Dict[str, str] = {}
        for member in tar.getmembers():
            key, ext = os.path.splitext(member.name)
            data = tar.extractfile(member).read()
            if ext.lower() in _IMAGE_EXTS:
                images[key] = data
            elif ext == ".txt":
                texts[key] = data.decode("utf-8")
    keys = sorted(k for k in images if k in texts)
    if order_seed is not None:
        keys = [keys[i] for i in
                np.random.default_rng(order_seed).permutation(len(keys))]
    for k in keys:
        yield k, images[k], texts[k]


def shard_plan(pattern: str, host_id: int = 0, num_hosts: int = 1,
               seed: int = 0, epoch: int = 0) -> List[str]:
    """This host's shard list for one epoch.

    All hosts compute the identical global permutation (seed, epoch) and
    take a strided slice — deterministic, coordination-free. Requires
    ``num_shards >= num_hosts`` for every host to see data.
    """
    shards = sorted(glob.glob(pattern))
    if not shards:
        raise FileNotFoundError(f"no shards match {pattern!r}")
    order = np.random.default_rng([seed, epoch]).permutation(len(shards))
    return [shards[i] for i in order[host_id::num_hosts]]


_RECORD_COUNT_CACHE: Dict[Tuple[str, float, int], int] = {}


def shard_record_count(shard_path: str) -> int:
    """Number of (image, caption) records in one tar shard.

    Reads tar member HEADERS only (tarfile seeks past payloads), so it is
    cheap even for large shards; cached by (path, mtime, size)."""
    st = os.stat(shard_path)
    key = (shard_path, st.st_mtime, st.st_size)
    hit = _RECORD_COUNT_CACHE.get(key)
    if hit is not None:
        return hit
    images, texts = set(), set()
    with tarfile.open(shard_path, "r") as tar:
        for member in tar:
            k, ext = os.path.splitext(member.name)
            if ext.lower() in _IMAGE_EXTS:
                images.add(k)
            elif ext == ".txt":
                texts.add(k)
    count = len(images & texts)
    _RECORD_COUNT_CACHE[key] = count
    return count


def host_batch_counts(pattern: str, batch_size: int, num_hosts: int,
                      seed: int = 0, epoch: int = 0,
                      drop_last: bool = False) -> List[int]:
    """Per-host number of batches this epoch — computable on EVERY host.

    Hosts take disjoint strided shard subsets, so their record (and hence
    batch) counts differ; a jitted step with mesh collectives deadlocks
    unless every host dispatches the same number of steps. The plan and
    the per-shard record counts are deterministic, so each host computes
    all hosts' counts without communicating and pads its own stream to
    ``max(host_batch_counts(...))`` (``make_shard_loader(pad_to_batches=
    ...)``)."""
    counts = []
    for h in range(num_hosts):
        records = sum(shard_record_count(s) for s in
                      shard_plan(pattern, h, num_hosts, seed, epoch))
        counts.append(records // batch_size if drop_last
                      else -(-records // batch_size))
    return counts


def make_shard_loader(pattern: str, tokenizer: WordPieceTokenizer,
                      batch_size: int, fixed_length: int,
                      size: int = 224, patchify_size: Optional[int] = None,
                      raw_uint8: bool = False,
                      host_id: int = 0, num_hosts: int = 1,
                      seed: int = 0, epoch: int = 0,
                      drop_last: bool = False,
                      pad_to_batches: Optional[int] = None
                      ) -> Iterator[Dict[str, np.ndarray]]:
    """Stream standard static-shape batches from tar shards.

    ``batch_size`` here is the LOCAL (per-host) batch: shard streams are
    independent per host, so unlike ``make_loader`` there is no global
    batch to slice. The ragged tail is padded + ``valid``-masked (never
    dropped) unless ``drop_last``.

    ``pad_to_batches``: emit all-padding (valid all-False) batches after
    the stream ends until that many batches have been yielded — multi-host
    step-count equalization (see :func:`host_batch_counts`).
    """
    from mae_clip_tpu.data.images import host_preprocess, patchify_host
    from mae_clip_tpu.data.pipeline import pad_token_batch

    use_native = False
    if raw_uint8 and patchify_size:
        from mae_clip_tpu.data import native_images
        use_native = native_images.native_available()

    def preprocess(img_bytes: bytes) -> np.ndarray:
        if use_native:
            # C++ fused JPEG decode -> resize -> patchify
            # (native/imagepipe.cpp) straight from the tar member bytes —
            # no tempfile, no python decode.
            from mae_clip_tpu.data import native_images
            out = native_images.jpeg_to_patches(img_bytes, size,
                                                patchify_size)
            if out is not None:
                return out
        img = decode_image_bytes(img_bytes)
        if raw_uint8:
            import cv2
            out = cv2.resize(img, (size, size),
                             interpolation=cv2.INTER_LINEAR)
        else:
            out = host_preprocess(img, size)
        if patchify_size:
            out = patchify_host(out, patchify_size)
        return out

    def emit(images: List[np.ndarray], captions: List[str]
             ) -> Dict[str, np.ndarray]:
        count = len(images)
        if count:
            imgs = np.stack(images)
        else:
            # All-padding equalization batch: same static shape as a
            # real batch, valid all-False.
            if patchify_size:
                shape = ((size // patchify_size) ** 2,
                         patchify_size * patchify_size * 3)
            else:
                shape = (size, size, 3)
            imgs = np.zeros((0,) + shape,
                            np.uint8 if raw_uint8 else np.float32)
        if count < batch_size:
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - count,) + imgs.shape[1:],
                                imgs.dtype)])
        enc = tokenizer.encode_batch(captions, max_length=fixed_length,
                                     fixed_length=fixed_length)
        ids, mask = pad_token_batch(
            np.asarray(enc["input_ids"], np.int32).reshape(
                count, fixed_length),
            np.asarray(enc["attention_mask"], np.int32).reshape(
                count, fixed_length), batch_size)
        valid = np.zeros((batch_size,), bool)
        valid[:count] = True
        return {"image": imgs, "input_ids": ids, "attention_mask": mask,
                "valid": valid}

    emitted = 0
    images: List[np.ndarray] = []
    captions: List[str] = []
    for si, shard in enumerate(shard_plan(pattern, host_id, num_hosts,
                                          seed, epoch)):
        # NOTE: not Python hash() — it is salted per process, which would
        # silently break cross-host determinism.
        for _, img_bytes, caption in iter_shard_records(
                shard, order_seed=(seed * 1000003 + epoch * 101 + si)
                % (2 ** 31)):
            images.append(preprocess(img_bytes))
            captions.append(caption)
            if len(images) == batch_size:
                yield emit(images, captions)
                emitted += 1
                images, captions = [], []
    if images and not drop_last:
        yield emit(images, captions)
        emitted += 1
    while pad_to_batches is not None and emitted < pad_to_batches:
        yield emit([], [])
        emitted += 1
