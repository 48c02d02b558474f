"""Input pipeline: caption dataset -> static-shape device-ready batches.

Functional equivalent of the reference's CLIPDataset + DataLoader
(reference: dataset.py:9-40, main.py:34-48) redesigned for TPU:

* captions are tokenized ONCE up-front for the whole dataset with
  pad-to-longest semantics (dataset.py:19-21) — but a ``fixed_length`` can
  pin a static width for cross-host determinism;
* batches have STATIC shapes: the ragged final batch (the reference has no
  drop_last, main.py:42-47) is padded to ``batch_size`` and carries a
  ``valid`` bool mask that the loss/meters consume, preserving the
  reference's count-weighted metric semantics;
* shuffling matches the reference policy (shuffle in train mode only),
  seeded per epoch for reproducibility;
* images load via a thread pool with double-buffered prefetch — the
  reference's num_workers analogue without process forks.

Output batches are plain numpy dicts: {image (B,H,W,C) f32 or u8,
input_ids (B,S) i32, attention_mask (B,S) i32, valid (B,) bool}.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from mae_clip_tpu.data.images import decode_image, host_preprocess
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer


class ImageFileSource:
    """Image files -> decoded/resized (optionally patchified uint8) arrays.

    The image half of the input pipeline, shared by the caption dataset and
    the image-only MAE-pretraining dataset.
    """

    def __init__(self, image_filenames: Sequence[str],
                 image_path: str = "", size: int = 224,
                 raw_uint8: bool = False,
                 patchify_size: Optional[int] = None,
                 native: str = "auto",
                 cache: bool = False):
        self.image_filenames = list(image_filenames)
        self.image_path = image_path
        self.size = size
        self.raw_uint8 = raw_uint8
        # ViT fast path: ship pre-patchified uint8 (B, N, P*P*C); the
        # device never touches minor-dim-3 layouts (see models.vit).
        self.patchify_size = patchify_size
        # Native C++ fused decode->resize->patchify (native/imagepipe.cpp)
        # for the raw_uint8+patchify path. "auto": use when built; "never":
        # python/cv2 path (bit-reproducible vs cv2 fixed-point rounding);
        # "always": error if the .so is missing.
        if native not in ("auto", "never", "always"):
            raise ValueError(f"unknown native mode {native!r}")
        self.native = native
        # Opt-in host-RAM cache of decoded outputs, keyed by FILENAME so
        # caption rows sharing an image decode it once. Epoch 1 pays the
        # decode; epochs 2+ are pure array gathers, which is what lets the
        # end-to-end epoch rate approach the step benchmark on RAM-resident
        # datasets (BASELINE.md "end-to-end epoch"). Deliberately bypassed
        # for augmented loads (fresh crop each epoch). Dict get/set are
        # GIL-atomic, so the threaded loader needs no lock (worst case two
        # threads decode the same image once).
        self._img_cache: Optional[dict] = {} if cache else None

    def __len__(self) -> int:
        return len(self.image_filenames)

    def sample_shape(self) -> Tuple[Tuple[int, ...], np.dtype]:
        """(shape, dtype) of one loaded image — without decoding any file.

        Lets the loaders build all-padding batches for hosts whose slice
        of a ragged global tail is empty (multi-host training: every host
        must emit the same number of static-shape batches or the mesh
        collectives deadlock)."""
        if self.patchify_size:
            n = (self.size // self.patchify_size) ** 2
            shape = (n, self.patchify_size * self.patchify_size * 3)
        else:
            shape = (self.size, self.size, 3)
        return shape, np.dtype(np.uint8 if self.raw_uint8 else np.float32)

    def _native_enabled(self) -> bool:
        if self.native == "never" or not (self.raw_uint8
                                          and self.patchify_size):
            return False
        from mae_clip_tpu.data import native_images
        ok = native_images.native_available()
        if self.native == "always" and not ok:
            raise RuntimeError("native='always' but native/libimagepipe.so "
                               "is not built (make -C native)")
        return ok

    def load_image(self, idx: int,
                   aug_rng: Optional[np.random.Generator] = None
                   ) -> np.ndarray:
        path = (f"{self.image_path}/{self.image_filenames[idx]}"
                if self.image_path else self.image_filenames[idx])
        if aug_rng is None and self._img_cache is not None:
            cached = self._img_cache.get(path)
            if cached is None:
                cached = self._load_path(path, aug_rng)
                self._img_cache[path] = cached
            return cached
        return self._load_path(path, aug_rng)

    def _load_path(self, path: str,
                   aug_rng: Optional[np.random.Generator]) -> np.ndarray:
        if aug_rng is None and self._native_enabled():
            # Native fused decode->resize->patchify fast path (fixed
            # resize geometry, so the augmented path bypasses it).
            from mae_clip_tpu.data import native_images
            try:
                with open(path, "rb") as f:
                    out = native_images.jpeg_to_patches(
                        f.read(), self.size, self.patchify_size)
            except OSError:
                out = None
            if out is None:  # non-JPEG or unreadable: decode in python
                out = native_images.rgb_to_patches(
                    decode_image(path), self.size, self.patchify_size)
            if out is not None:
                return out

        # One sizing step — RandomResizedCrop+flip (MAE pretraining) or
        # the plain cv2 bilinear resize — then a shared output tail.
        img = decode_image(path)
        if aug_rng is not None:
            from mae_clip_tpu.data.images import random_resized_crop_flip
            sized = random_resized_crop_flip(img, self.size, aug_rng)
        else:
            import cv2
            sized = cv2.resize(img, (self.size, self.size),
                               interpolation=cv2.INTER_LINEAR)
        out = sized if self.raw_uint8 else host_preprocess(sized, self.size)
        if self.patchify_size:
            from mae_clip_tpu.data.images import patchify_host
            return patchify_host(out, self.patchify_size)
        return out


class ImageDataset(ImageFileSource):
    """Images only — the MAE-pretraining input (no captions, no tokenizer).

    ``from_directory`` globs common image extensions under a directory tree
    (sorted for cross-host determinism).
    """

    @classmethod
    def from_directory(cls, root: str, **kw) -> "ImageDataset":
        import os
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        files = sorted(
            os.path.join(dirpath, f)
            for dirpath, _, names in os.walk(root)
            for f in names if f.lower().endswith(exts))
        if not files:
            raise FileNotFoundError(f"no images under {root!r}")
        return cls(files, **kw)


class CaptionDataset(ImageFileSource):
    """(image file, caption) records with whole-dataset tokenization."""

    def __init__(self, image_filenames: Sequence[str],
                 captions: Sequence[str], tokenizer: WordPieceTokenizer,
                 image_path: str = "", size: int = 224,
                 max_length: int = 200,
                 fixed_length: Optional[int] = None,
                 raw_uint8: bool = False,
                 patchify_size: Optional[int] = None,
                 native: str = "auto",
                 cache: bool = False):
        assert len(image_filenames) == len(captions)
        super().__init__(image_filenames, image_path=image_path, size=size,
                         raw_uint8=raw_uint8, patchify_size=patchify_size,
                         native=native, cache=cache)
        self.captions = [str(c) for c in captions]
        enc = tokenizer.encode_batch(self.captions, max_length=max_length,
                                     fixed_length=fixed_length)
        self.input_ids = np.asarray(enc["input_ids"], dtype=np.int32)
        self.attention_mask = np.asarray(enc["attention_mask"],
                                         dtype=np.int32)

    def __len__(self) -> int:
        return len(self.captions)


def pad_token_batch(ids: np.ndarray, mask: np.ndarray, batch_size: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad (n, S) token ids + attention mask to ``batch_size`` rows.

    Pad rows keep ONE valid attention token so the attention softmax over
    an all-masked row stays finite — the single place this invariant
    lives (used by the loader, the frozen-text precompute, and serving).
    """
    pad = batch_size - len(ids)
    if pad <= 0:
        return ids, mask
    ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
    pad_mask = np.zeros((pad, mask.shape[1]), mask.dtype)
    pad_mask[:, 0] = 1
    mask = np.concatenate([mask, pad_mask])
    return ids, mask


def make_loader(dataset: CaptionDataset, batch_size: int,
                shuffle: bool = False, seed: int = 0,
                drop_last: bool = False, num_threads: int = 8,
                prefetch: int = 2,
                images: Optional[np.ndarray] = None,
                host_id: int = 0, num_hosts: int = 1,
                text_features: Optional[np.ndarray] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield static-shape batches; the ragged tail is padded + masked.

    ``images``: optional preloaded (N,H,W,C) array (e.g. synthetic or
    in-memory datasets) that bypasses file decode.

    ``text_features``: optional precomputed (N, D) FROZEN text-tower
    features (``train.loop.precompute_text_features``); batches then carry
    ``text_features`` instead of token ids and the train step skips the
    text tower entirely (valid only when the tower is frozen AND runs in
    eval mode — otherwise its output is not a pure function of the
    caption).

    Multi-host: ``batch_size`` is the GLOBAL batch; each host yields its
    contiguous ``batch_size // num_hosts`` slice of every global batch, so
    all hosts run the same number of steps over the same seed-deterministic
    order (cross-host determinism: the shuffle depends only on (seed, n)).
    Only this host's images are decoded.
    """
    if batch_size % num_hosts != 0:
        raise ValueError(f"global batch {batch_size} not divisible by "
                         f"num_hosts {num_hosts}")
    local_bs = batch_size // num_hosts
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    num_batches = n // batch_size if drop_last else -(-n // batch_size)

    def build_batch(bi: int) -> Dict[str, np.ndarray]:
        idx_global = order[bi * batch_size:(bi + 1) * batch_size]
        idx = idx_global[host_id * local_bs:(host_id + 1) * local_bs]
        count = len(idx)
        pad = local_bs - count
        if images is not None:
            imgs = images[idx]
        elif count:
            imgs = np.stack([dataset.load_image(i) for i in idx])
        else:
            # This host's slice of a ragged global tail is empty: emit an
            # all-padding batch (valid all-False) so every host runs the
            # same number of steps.
            shape, dtype = dataset.sample_shape()
            imgs = np.zeros((0,) + shape, dtype)
        if pad:
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        valid = np.zeros((local_bs,), dtype=bool)
        valid[:count] = True
        if text_features is not None:
            feats = text_features[idx]
            if pad:
                feats = np.concatenate(
                    [feats, np.zeros((pad, feats.shape[1]), feats.dtype)])
            return {"image": imgs, "text_features": feats, "valid": valid}
        ids, mask = pad_token_batch(dataset.input_ids[idx],
                                    dataset.attention_mask[idx], local_bs)
        return {"image": imgs, "input_ids": ids, "attention_mask": mask,
                "valid": valid}

    yield from _prefetched(build_batch, num_batches, num_threads, prefetch)


def _prefetched(build_batch, num_batches: int, num_threads: int,
                prefetch: int) -> Iterator[Dict[str, np.ndarray]]:
    if num_threads <= 1 or num_batches <= 1:
        for bi in range(num_batches):
            yield build_batch(bi)
        return

    # Thread-pooled prefetch: keep ``prefetch`` batches in flight.
    with cf.ThreadPoolExecutor(max_workers=num_threads) as pool:
        inflight: List[cf.Future] = []
        next_bi = 0
        while next_bi < num_batches and len(inflight) < max(prefetch, 1):
            inflight.append(pool.submit(build_batch, next_bi))
            next_bi += 1
        while inflight:
            fut = inflight.pop(0)
            if next_bi < num_batches:
                inflight.append(pool.submit(build_batch, next_bi))
                next_bi += 1
            yield fut.result()


def make_image_loader(dataset: ImageFileSource, batch_size: int,
                      shuffle: bool = False, seed: int = 0,
                      drop_last: bool = False, num_threads: int = 8,
                      prefetch: int = 2,
                      images: Optional[np.ndarray] = None,
                      host_id: int = 0, num_hosts: int = 1,
                      augment: bool = False
                      ) -> Iterator[Dict[str, np.ndarray]]:
    """Image-only loader for MAE pretraining: yields static-shape
    {image, valid} batches with the same padded-ragged-tail, seeded-shuffle,
    and multi-host slicing semantics as ``make_loader``.

    ``augment=True`` applies RandomResizedCrop+flip per image (the MAE
    pretraining augmentation); deterministic in (seed, image index), so
    vary ``seed`` per epoch for fresh crops."""
    if augment and images is not None:
        raise ValueError(
            "augment=True needs file-backed images (crops are taken from "
            "the full-resolution source); preloaded `images=` arrays are "
            "already sized and would silently skip augmentation")
    if batch_size % num_hosts != 0:
        raise ValueError(f"global batch {batch_size} not divisible by "
                         f"num_hosts {num_hosts}")
    local_bs = batch_size // num_hosts
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)

    num_batches = n // batch_size if drop_last else -(-n // batch_size)

    def build_batch(bi: int) -> Dict[str, np.ndarray]:
        idx_global = order[bi * batch_size:(bi + 1) * batch_size]
        idx = idx_global[host_id * local_bs:(host_id + 1) * local_bs]
        count = len(idx)
        pad = local_bs - count
        if images is not None:
            imgs = images[idx]
        elif count:
            imgs = np.stack([
                dataset.load_image(
                    i, np.random.default_rng([seed, int(i)])
                    if augment else None)
                for i in idx])
        else:
            shape, dtype = dataset.sample_shape()
            imgs = np.zeros((0,) + shape, dtype)
        if pad:
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        valid = np.zeros((local_bs,), dtype=bool)
        valid[:count] = True
        return {"image": imgs, "valid": valid}

    yield from _prefetched(build_batch, num_batches, num_threads, prefetch)
