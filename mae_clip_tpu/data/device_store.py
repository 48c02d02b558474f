"""Device-resident dataset staging: the whole dataset in HBM, batches by
on-device gather.

TPU-native answer to input-bound training when the decoded dataset fits
device memory (a 224px uint8-patch dataset is ~150 KB/image, so ~100k
images fit comfortably in a v5e's 16 GB alongside the flagship model).
The decoded images (and, for frozen-text recipes, the cached text
features — ``train.loop.precompute_text_features``) are uploaded ONCE;
every train/eval step then gathers its batch HBM->HBM from a (B,) int32
index vector, so per-step host->device traffic drops from the full batch
(38 MB at b256) to a few hundred bytes.

This is the difference between step-rate and input-rate training whenever
H2D bandwidth can't feed the chip: measured on this remote-tunnel setup,
the file loader sustains ~75 pairs/s (16-35 MB/s H2D) while the train
step itself runs at ~9.7k pairs/s — device staging recovers the step
rate (BASELINE.md "end-to-end epoch").

The reference has no analogue (its DataLoader re-reads JPEGs from disk
every epoch, dataset.py:24-33); the closest torch idiom is a
TensorDataset pinned to GPU memory.

Design notes:
* The gather is a separate tiny jitted function, NOT part of the train
  step: the step keeps its (state, batch) signature and donated state,
  the store rides through as an ordinary non-donated argument (zero-copy
  for device-resident arrays), and both dispatches are async so the
  extra hop costs no wall-clock.
* Uploads are chunked (``device_put`` of ~100-200 MB slabs, concatenated
  on device) so the host never materialises a second full copy and the
  transfer streams.
* Multi-chip: replicate for small DP meshes (pass
  ``sharding=NamedSharding(mesh, P())``), or row-shard with
  ``ShardedDeviceStore`` (capacity scales with mesh size; blocked index
  loaders keep the hot gather collective-free). Multi-HOST: the sharded
  store stages per process (``_build_sharded_store_multiprocess``);
  per-host file sharding (``data/shards.py``) remains the streaming
  alternative when the dataset exceeds HBM.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, Iterator, Optional, Tuple

import numpy as np


class DeviceStore:
    """Named (N, ...) device arrays + a jitted batch gather.

    ``maps`` enables DEDUPED staging: ``maps[k]`` is an (N,) int32
    row->storage-index table and ``arrays[k]`` holds only the UNIQUE
    storage rows — the gather for key ``k`` becomes a two-level take
    (``arrays[k][maps[k][indices]]``). Caption datasets repeat each image
    once per caption (reference coco_captions_to_df.py:17-25: 5 COCO
    captions/image), so deduping the image array cuts staged HBM ~5x on
    COCO-shaped data with bit-identical batches. Map tables live inside
    ``self.arrays`` under reserved ``"_map:"``-prefixed keys so they ride
    through jit argument trees (the Trainer superstep passes
    ``store.arrays`` straight into its scan).
    """

    MAP_PREFIX = "_map:"

    def __init__(self, arrays: Dict[str, "jax.Array"],
                 maps: Optional[Dict[str, "np.ndarray"]] = None):
        import jax
        import jax.numpy as jnp

        if not arrays:
            raise ValueError("DeviceStore needs at least one array")
        arrays = dict(arrays)
        for k, m in (maps or {}).items():
            if k not in arrays:
                raise ValueError(f"map for unknown array {k!r}")
            arrays[self.MAP_PREFIX + k] = jnp.asarray(m, jnp.int32)
        # Row count N comes from unmapped arrays + map tables (all must
        # agree); mapped arrays' own leading dim is their unique count.
        mapped = {k[len(self.MAP_PREFIX):] for k in arrays
                  if k.startswith(self.MAP_PREFIX)}
        ns = {k: int(v.shape[0]) for k, v in arrays.items()
              if k not in mapped}
        if len(set(ns.values())) != 1:
            raise ValueError(f"inconsistent leading dims: {ns}")
        self.arrays = arrays
        self.n = next(iter(ns.values()))
        self.n_real = self.n      # sharded stores pad; see subclass

        # Bind the BASE gather explicitly: subclasses override
        # traced_gather with layout-constrained hot paths (ShardedDevice-
        # Store's collective-free blocked gather), but the eager .gather
        # must keep accepting arbitrary indices.
        self._gather = jax.jit(
            lambda arrays, indices:
            DeviceStore.traced_gather(self, arrays, indices))

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self.arrays.values())

    def gather(self, indices) -> Dict[str, "jax.Array"]:
        """(B,) int32 device/host indices -> on-device batch dict."""
        return self._gather(self.arrays, indices)

    # Above this operand size, traced row gathers unroll into B dynamic
    # slices instead of one XLA gather: this backend's TPU compiler
    # allocates a FULL-OPERAND temp copy for every gather op (measured
    # round 5: take on a 1.4 GiB store plans a 1.43 GiB temp; dtype-
    # independent), which at 100k-row scale stacked to 3x the store and
    # OOM'd the 16 GiB chip at compile. Unrolled dynamic slices plan
    # ~zero temp at ~80 s extra compile per (B,) shape — worth it only
    # when the copy threatens HBM. Override: MAE_CLIP_UNROLL_GATHER_GB.
    UNROLLED_GATHER_MIN_BYTES = int(float(os.environ.get(
        "MAE_CLIP_UNROLL_GATHER_GB", "2.5")) * 2**30)

    def _rows(self, v, idx):
        """Row gather for (B,) resolved indices; see the class constant
        for why big operands avoid the XLA gather op."""
        import jax
        import jax.numpy as jnp

        nbytes = int(np.prod(v.shape)) * v.dtype.itemsize
        b = idx.shape[0] if idx.ndim else None
        if b and nbytes >= self.UNROLLED_GATHER_MIN_BYTES:
            rows = [jax.lax.dynamic_index_in_dim(v, idx[k], 0,
                                                 keepdims=True)
                    for k in range(b)]
            return jax.lax.concatenate(rows, 0)
        return jnp.take(v, idx, axis=0)

    def traced_gather(self, arrays, indices) -> Dict[str, "jax.Array"]:
        """Gather traceable inside a CALLER's jit (the Trainer superstep
        calls this inside its ``lax.scan``). ``arrays`` is passed through
        the caller's argument tree so donation/sharding inference sees it."""
        import jax.numpy as jnp

        out = {}
        for k, v in arrays.items():
            if k.startswith(self.MAP_PREFIX):
                continue
            mk = self.MAP_PREFIX + k
            idx = (jnp.take(arrays[mk], indices, axis=0) if mk in arrays
                   else indices)
            out[k] = self._rows(v, idx)
        return out


def _stream_upload(slabs: Iterable[Tuple[int, np.ndarray]],
                   shape: Tuple[int, ...], dtype,
                   sharding=None) -> "jax.Array":
    """Stage row slabs into one (N, ...) device buffer as they arrive.

    Preallocates the buffer directly at its final placement and fills it
    with DONATED dynamic_update_slice calls: peak device memory stays at
    N + one slab. (Concatenating device_put chunks would hold every chunk
    alive while allocating the full result — ~2x the dataset, halving the
    stageable capacity.) The start index is traced, so only two
    executables compile: full slab and ragged tail. ``slabs`` may be any
    iterator — a generator decoding lazily overlaps decode with upload.
    """
    import jax
    import jax.numpy as jnp

    kw = {"device": sharding} if sharding is not None else {}
    buf = jax.jit(lambda: jnp.zeros(shape, dtype),
                  **({"out_shardings": sharding}
                     if sharding is not None else {}))()
    place = jax.jit(
        lambda b, part, start: jax.lax.dynamic_update_slice(
            b, part, (start,) + (jnp.int32(0),) * (b.ndim - 1)),
        donate_argnums=(0,))
    for s, slab in slabs:
        part = jax.device_put(np.ascontiguousarray(slab), **kw)
        buf = place(buf, part, jnp.int32(s))
    return buf


def _upload_chunked(big: np.ndarray, chunk_rows: int,
                    sharding=None) -> "jax.Array":
    import jax

    kw = {"device": sharding} if sharding is not None else {}
    if len(big) <= chunk_rows:
        return jax.device_put(big, **kw)
    return _stream_upload(
        ((s, big[s:s + chunk_rows])
         for s in range(0, len(big), chunk_rows)),
        big.shape, big.dtype, sharding)


def _decode_rows(dataset, rows, num_threads: int) -> np.ndarray:
    """Decode a list of dataset rows into one stacked array.

    Fast path: the native C thread pool (``imagepipe.cpp::ip_batch_files``
    — ONE ctypes call for the whole slab, decode->resize->patchify fused,
    no per-image Python) when the dataset is on the uint8-patches layout
    and the native lib is built; rows the native decoder rejects (non-JPEG
    files) fall back to ``load_image``. Otherwise a Python thread pool of
    ``load_image`` (which itself respects the dataset's native single-image
    path and host cache)."""
    rows = list(rows)
    if (getattr(dataset, "raw_uint8", False)
            and getattr(dataset, "patchify_size", None)
            and getattr(dataset, "_img_cache", None) is None
            and getattr(dataset, "_native_enabled", lambda: False)()):
        from mae_clip_tpu.data import native_images
        prefix = dataset.image_path
        paths = [f"{prefix}/{dataset.image_filenames[i]}" if prefix
                 else dataset.image_filenames[i] for i in rows]
        res = native_images.batch_files_to_patches(
            paths, dataset.size, dataset.patchify_size, num_threads)
        if res is not None:
            out, failed = res
            for j in np.nonzero(failed)[0]:
                out[j] = dataset.load_image(rows[int(j)])
            return out

    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(max_workers=num_threads) as pool:
        return np.stack(list(pool.map(dataset.load_image, rows)))


def _decode_all(dataset, num_threads: int, rows=None) -> np.ndarray:
    """Decode ``dataset`` images (``rows``: a row subset; default all)
    into one stacked array — see ``_decode_rows`` for the path choice."""
    rows = range(len(dataset)) if rows is None else list(rows)
    return _decode_rows(dataset, rows, num_threads)


def _overlapped_decode_upload(dataset, rows, num_threads: int,
                              chunk_rows: int, sharding,
                              timings: Optional[dict]) -> "jax.Array":
    """Slab-pipelined staging: a producer thread decodes slab k+1 while
    the main thread streams slab k to the device.

    Both sides of the overlap release the GIL for their long stretches
    (native/cv2 decode; tunnel H2D transfer), so on the 1-core host the
    wall time approaches max(decode, upload) instead of their sum.
    ``timings`` (optional dict) gains busy-time attribution: decode_s
    (producer), upload_s (main-thread device_put+place), wall_s."""
    import queue
    import threading

    rows = list(rows)
    n = len(rows)
    q: "queue.Queue" = queue.Queue(maxsize=1)
    t_decode = [0.0]

    def producer():
        try:
            for s in range(0, n, chunk_rows):
                t0 = time.perf_counter()
                slab = _decode_rows(dataset, rows[s:s + chunk_rows],
                                    num_threads)
                t_decode[0] += time.perf_counter() - t0
                q.put((s, slab))
            q.put(None)
        except BaseException as e:            # noqa: BLE001
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    t_wall = time.perf_counter()
    thread.start()
    t_upload = [0.0]

    def slabs():
        while True:
            got = q.get()
            if got is None:
                return
            if isinstance(got, BaseException):
                raise got
            t0 = time.perf_counter()
            yield got
            t_upload[0] += time.perf_counter() - t0

    # Shape/dtype without decoding: ImageFileSource.sample_shape.
    shape, dtype = dataset.sample_shape()
    out = _stream_upload(slabs(), (n,) + shape, dtype, sharding)
    thread.join()
    if timings is not None:
        timings["decode_s"] = round(t_decode[0], 3)
        timings["upload_s"] = round(t_upload[0], 3)
        timings["wall_s"] = round(time.perf_counter() - t_wall, 3)
        timings["overlap"] = True
    return out


def build_device_store(dataset, text_features: Optional[np.ndarray] = None,
                       images: Optional[np.ndarray] = None,
                       num_threads: int = 8,
                       chunk_bytes: int = 128 * 1024 * 1024,
                       sharding=None,
                       dedup_images: bool = True,
                       overlap: bool = True,
                       timings: Optional[dict] = None) -> DeviceStore:
    """Decode the whole dataset once (native bulk decoder / thread pool —
    ``_decode_rows``) and stage it in device memory.

    ``dataset`` is an ``ImageFileSource`` (``CaptionDataset`` adds the
    token table). ``text_features`` (N, D) switches the store to the
    frozen-text layout (no token ids on device — the tower is skipped).
    ``images``: preloaded (N, ...) array bypassing file decode (tests,
    synthetic data).

    ``dedup_images`` (default on): caption datasets carry one ROW per
    caption with the image repeated (reference coco_captions_to_df.py:
    17-25), so the store stages each unique image file ONCE plus an (N,)
    row->image map — staged HBM drops by the duplication factor (5x on
    COCO, 2x on Flickr8k/synth) with bit-identical gathers. Applies when
    ``dataset`` exposes ``image_filenames`` and images aren't preloaded.

    ``overlap`` (default on): pipeline decode with the slab uploads (a
    producer thread decodes slab k+1 while slab k streams to the device)
    — the host also never materializes the full decoded array.
    ``timings``: optional dict filled with the setup attribution
    (decode_s / upload_s / wall_s) for BASELINE-style breakdowns.
    """
    maps = None
    rows_subset = None
    if images is None:
        fnames = getattr(dataset, "image_filenames", None)
        if dedup_images and fnames is not None:
            fnames = np.asarray(fnames)
            uniq, first_rows, inverse = np.unique(
                fnames, return_index=True, return_inverse=True)
            if len(uniq) < len(fnames):
                rows_subset = first_rows.tolist()
                maps = {"image": inverse.astype(np.int32)}
        if rows_subset is None:
            rows_subset = list(range(len(dataset)))

    if images is None and overlap and hasattr(dataset, "sample_shape"):
        shape, dtype = dataset.sample_shape()
        per_row = int(np.prod(shape)) * dtype.itemsize
        chunk = max(1, chunk_bytes // max(per_row, 1))
        img_arr = _overlapped_decode_upload(
            dataset, rows_subset, num_threads, chunk, sharding, timings)
    else:
        if images is None:
            t0 = time.perf_counter()
            images = _decode_all(dataset, num_threads, rows=rows_subset)
            if timings is not None:
                timings["decode_s"] = round(time.perf_counter() - t0, 3)
        per_row = int(np.prod(images.shape[1:])) * images.dtype.itemsize
        chunk = max(1, chunk_bytes // max(per_row, 1))
        t0 = time.perf_counter()
        img_arr = _upload_chunked(images, chunk, sharding)
        if timings is not None:
            timings["upload_s"] = round(time.perf_counter() - t0, 3)
            timings["overlap"] = False
    arrays = {"image": img_arr}
    if text_features is not None:
        arrays["text_features"] = _upload_chunked(
            np.asarray(text_features), len(text_features), sharding)
    elif hasattr(dataset, "input_ids"):
        arrays["input_ids"] = _upload_chunked(
            dataset.input_ids, len(dataset.input_ids), sharding)
        arrays["attention_mask"] = _upload_chunked(
            dataset.attention_mask, len(dataset.attention_mask), sharding)
    return DeviceStore(arrays, maps=maps)


class ShardedDeviceStore(DeviceStore):
    """Row-sharded store over a mesh data axis: each DP shard holds ONLY
    its contiguous 1/D slice, so stageable capacity scales with mesh size
    (a replicated store pays the full N bytes on every device).

    Hot-path contract: ``traced_gather`` runs a shard_map LOCAL gather —
    zero collectives — and therefore requires BLOCKED index batches:
    global batch block d (of D) must index shard d's row range
    ``[d*rows_per_shard, (d+1)*rows_per_shard)``. ``make_sharded_index_
    loader`` emits exactly this layout (each real row once per epoch).
    The eager ``gather`` accepts ARBITRARY indices (plain global take;
    XLA inserts the needed communication) so eval-path full sweeps
    (``eval.retrieval.compute_image_embeddings_from_store``) work
    unchanged, just not collective-free.

    Multi-controller: ``build_sharded_device_store`` dispatches to
    ``_build_sharded_store_multiprocess`` under ``process_count > 1`` —
    each process decodes/stages only its addressable shards' rows and
    the class operates on the assembled global arrays unchanged.
    """

    def __init__(self, arrays: Dict[str, "jax.Array"], mesh,
                 axis: str = "data", n_real: Optional[int] = None,
                 maps: Optional[Dict[str, "np.ndarray"]] = None):
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        super().__init__(arrays, maps=maps)
        if n_real is not None:
            self.n_real = n_real  # rows before pad-to-multiple-of-D
        d = mesh.shape[axis]
        if self.n % d:
            raise ValueError(
                f"sharded store rows ({self.n}) must divide the mesh "
                f"'{axis}' axis ({d}); pad first "
                f"(build_sharded_device_store does)")
        self.mesh, self.axis = mesh, axis
        self.rows_per_shard = self.n // d
        rps = self.rows_per_shard
        prefix = self.MAP_PREFIX

        def local_gather(arrs, idx):
            # arrs values are the LOCAL shard blocks here. Deduped
            # arrays resolve row -> GLOBAL storage index through their
            # map table (built per-shard, so the storage row always
            # lives on the same shard as the data row — still zero
            # collectives); v.shape[0] IS the per-shard storage rows.
            shard = jax.lax.axis_index(axis)
            local = idx - shard * rps
            out = {}
            for k, v in arrs.items():
                if k.startswith(prefix):
                    continue
                mk = prefix + k
                if mk in arrs:
                    g = jnp.take(arrs[mk], local, axis=0)
                    out[k] = jnp.take(v, g - shard * v.shape[0], axis=0)
                else:
                    out[k] = jnp.take(v, local, axis=0)
            return out

        self._local_gather = shard_map(
            local_gather, mesh=mesh,
            in_specs=({k: P(axis) for k in self.arrays}, P(axis)),
            out_specs=P(axis))

    def traced_gather(self, arrays, indices) -> Dict[str, "jax.Array"]:
        """Collective-free local gather (requires BLOCKED indices)."""
        return self._local_gather(arrays, indices)


def _dedup_decode_sharded(dataset, fnames: np.ndarray, d: int,
                          num_threads: int):
    """Per-shard image dedup for the row-sharded store: each shard's
    contiguous row range [s*rps, (s+1)*rps) dedups independently (so a
    row's storage always lives on the row's own shard — the local-gather
    contract holds), storage is padded to the max per-shard unique count
    so the array shards uniformly, and the (rps*d,) map table carries
    GLOBAL storage indices so the eager arbitrary-index ``gather`` works
    through the base two-level take unchanged.

    Returns (storage, map_table) or (None, None) when dedup wouldn't
    shrink anything (all rows unique in every shard)."""
    n = len(fnames)
    rps = -(-n // d)
    per_shard = []                          # (global first rows, inverse)
    for sh in range(d):
        lo, hi = sh * rps, min((sh + 1) * rps, n)
        _, first, inv = np.unique(fnames[lo:hi],
                                  return_index=True, return_inverse=True)
        per_shard.append((lo + first, inv))
    u_max = max(len(first) for first, _ in per_shard)
    if u_max >= rps:
        return None, None
    decoded = _decode_all(
        dataset, num_threads,
        rows=np.concatenate([first for first, _ in per_shard]).tolist())
    storage = np.zeros((d * u_max,) + decoded.shape[1:], decoded.dtype)
    map_table = np.zeros((rps * d,), np.int32)
    off = 0
    for sh, (first, inv) in enumerate(per_shard):
        u = len(first)
        storage[sh * u_max:sh * u_max + u] = decoded[off:off + u]
        map_table[sh * rps:sh * rps + len(inv)] = sh * u_max + inv
        map_table[sh * rps + len(inv):(sh + 1) * rps] = sh * u_max  # pad
        off += u
    return storage, map_table


def build_sharded_device_store(dataset=None, mesh=None, axis: str = "data",
                               text_features: Optional[np.ndarray] = None,
                               images: Optional[np.ndarray] = None,
                               num_threads: int = 8,
                               dedup_images: bool = True,
                               timings: Optional[dict] = None
                               ) -> ShardedDeviceStore:
    """``build_device_store``'s row-sharded counterpart: decode once, pad
    to a multiple of the mesh '``axis``' size (zero rows; the sharded
    index loader never marks them valid), place each array with ONE
    ``device_put`` per array (each device materializes only its slice —
    no transient 2x).

    ``dedup_images`` (default on, matching ``build_device_store``): the
    dedup is PER SHARD — see ``_dedup_decode_sharded`` — so repeated
    captions save their ~duplication-factor of HBM here too, as long as
    a row and its image's first occurrence land in the same contiguous
    row range (caption datasets group captions per image, so they do).

    Multi-controller (``jax.process_count() > 1``): each process decodes
    and uploads ONLY the rows its addressable devices hold (the sharded
    layout already gives every device a contiguous row block), and the
    global arrays are assembled with
    ``jax.make_array_from_single_device_arrays`` — so staging cost AND
    HBM scale with the per-host share, which is what makes the fastest
    epoch path available at pod scale (VERDICT r4 #4)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        raise ValueError("build_sharded_device_store needs a mesh")
    if jax.process_count() > 1:
        return _build_sharded_store_multiprocess(
            dataset, mesh, axis, text_features=text_features,
            images=images, num_threads=num_threads,
            dedup_images=dedup_images, timings=timings)
    d = mesh.shape[axis]
    maps = None
    n = None
    if images is None:
        t0 = time.perf_counter()
        fnames = getattr(dataset, "image_filenames", None)
        if dedup_images and fnames is not None:
            storage, map_table = _dedup_decode_sharded(
                dataset, np.asarray(fnames), d, num_threads)
            if storage is not None:
                images, maps, n = storage, {"image": map_table}, len(fnames)
        if images is None:
            images = _decode_all(dataset, num_threads)
        if timings is not None:
            timings["decode_s"] = round(time.perf_counter() - t0, 3)
    if n is None:
        n = len(images)
    t_up = time.perf_counter()
    rps = -(-n // d)
    pad = rps * d - n

    def padded(a: np.ndarray) -> np.ndarray:
        a = np.asarray(a)
        if pad:
            a = np.concatenate(
                [a, np.zeros((pad,) + a.shape[1:], a.dtype)])
        return a

    sharding = NamedSharding(mesh, P(axis))
    put = lambda a: jax.device_put(padded(a), sharding)
    if maps is not None:
        # Deduped storage is already padded/aligned; the ROW-space pad
        # applies to the map table (and any per-row arrays) instead.
        arrays = {"image": jax.device_put(images, sharding)}
        maps = {"image": jax.device_put(
            np.asarray(maps["image"], np.int32),
            sharding)}  # already rps*d rows
    else:
        arrays = {"image": put(images)}
    if text_features is not None:
        arrays["text_features"] = put(text_features)
    elif dataset is not None and hasattr(dataset, "input_ids"):
        arrays["input_ids"] = put(dataset.input_ids)
        arrays["attention_mask"] = put(dataset.attention_mask)
    if timings is not None:
        timings["upload_s"] = round(time.perf_counter() - t_up, 3)
    return ShardedDeviceStore(arrays, mesh, axis, n_real=n, maps=maps)


def _build_sharded_store_multiprocess(dataset, mesh, axis: str,
                                      text_features=None, images=None,
                                      num_threads: int = 8,
                                      dedup_images: bool = True,
                                      timings: Optional[dict] = None
                                      ) -> "ShardedDeviceStore":
    """Multi-controller ``build_sharded_device_store``: decode/stage only
    this process's rows; assemble global arrays from per-device buffers.

    Every process runs this in lockstep with IDENTICAL metadata (the
    dataset's filenames/token tables are global on every host; only image
    DECODE is restricted to local rows), so all sharding decisions —
    padding, per-shard dedup layout, u_max — are computed
    coordination-free from that shared metadata."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    d = mesh.shape[axis]
    n = len(images) if images is not None else len(dataset)
    rps = -(-n // d)
    n_pad = rps * d
    sharding = NamedSharding(mesh, P(axis))
    t0 = time.perf_counter()

    def assemble(global_shape, dtype, block_fn):
        """Global array from per-addressable-device host blocks.

        ``block_fn(lo, hi)`` returns host rows [lo, hi) of the global
        array; devices sharing a block (e.g. along a model axis) reuse
        the one decoded copy."""
        imap = sharding.addressable_devices_indices_map(global_shape)
        cache: Dict[Tuple[int, int], np.ndarray] = {}
        bufs = []
        for dev, idx in imap.items():
            sl = idx[0]
            lo = 0 if sl.start is None else int(sl.start)
            hi = global_shape[0] if sl.stop is None else int(sl.stop)
            if (lo, hi) not in cache:
                blk = np.ascontiguousarray(np.asarray(block_fn(lo, hi)))
                cache[(lo, hi)] = blk.astype(dtype, copy=False)
            bufs.append(jax.device_put(cache[(lo, hi)], dev))
        return jax.make_array_from_single_device_arrays(
            tuple(global_shape), sharding, bufs)

    def sliced(a, pad_rows: int):
        """block_fn for an (n, ...) host array padded to ``pad_rows``."""
        a = np.asarray(a)

        def block(lo, hi):
            real = a[lo:min(hi, n)]
            if hi > n and hi - max(lo, n) > 0:
                real = np.concatenate([real, np.zeros(
                    (hi - max(lo, n),) + a.shape[1:], a.dtype)])
            return real

        return (pad_rows,) + a.shape[1:], a.dtype, block

    maps = None
    if images is not None:
        shape, dtype, img_block = sliced(images, n_pad)
    else:
        row_shape, dtype = dataset.sample_shape()
        shape = (n_pad,) + tuple(row_shape)
        fnames = getattr(dataset, "image_filenames", None)
        per_shard = None
        if dedup_images and fnames is not None:
            fnames = np.asarray(fnames)
            per_shard = []
            for sh in range(d):
                lo, hi = sh * rps, min((sh + 1) * rps, n)
                _, first, inv = np.unique(
                    fnames[lo:hi], return_index=True, return_inverse=True)
                per_shard.append((lo + first, inv))
            u_max = max(len(first) for first, _ in per_shard)
            if u_max >= rps:
                per_shard = None           # dedup wouldn't shrink anything
        if per_shard is not None:
            shape = (d * u_max,) + tuple(row_shape)

            def img_block(lo, hi):
                sh = lo // u_max
                first, _ = per_shard[sh]
                blk = _decode_rows(dataset, first.tolist(), num_threads)
                if len(first) < u_max:
                    blk = np.concatenate([blk, np.zeros(
                        (u_max - len(first),) + blk.shape[1:], blk.dtype)])
                return blk

            def map_block(lo, hi):
                sh = lo // rps
                first, inv = per_shard[sh]
                out = np.full((rps,), sh * u_max, np.int32)
                out[:len(inv)] = sh * u_max + inv
                return out

            maps = {"image": assemble((n_pad,), np.int32, map_block)}
        else:
            def img_block(lo, hi):
                real_hi = min(hi, n)
                blk = (_decode_rows(dataset, range(lo, real_hi), num_threads)
                       if real_hi > lo
                       else np.zeros((0,) + tuple(row_shape), dtype))
                pad_rows = hi - max(lo, real_hi)
                if pad_rows > 0:
                    blk = np.concatenate([blk, np.zeros(
                        (pad_rows,) + tuple(row_shape), blk.dtype)])
                return blk

    arrays = {"image": assemble(shape, dtype, img_block)}
    if text_features is not None:
        arrays["text_features"] = assemble(*sliced(text_features, n_pad))
    elif dataset is not None and hasattr(dataset, "input_ids"):
        arrays["input_ids"] = assemble(*sliced(dataset.input_ids, n_pad))
        arrays["attention_mask"] = assemble(
            *sliced(dataset.attention_mask, n_pad))
    if timings is not None:
        timings["stage_local_s"] = round(time.perf_counter() - t0, 3)
    return ShardedDeviceStore(arrays, mesh, axis, n_real=n, maps=maps)


def make_sharded_index_loader(n: int, batch_size: int, n_shards: int,
                              shuffle: bool = False, seed: int = 0,
                              epoch: int = 0
                              ) -> Iterator[Dict[str, np.ndarray]]:
    """Blocked index batches for a ``ShardedDeviceStore``: batch block d
    (size ``batch_size // n_shards``) draws only from shard d's row range,
    so the store's shard_map gather stays local. Every REAL row (< n)
    appears exactly once per epoch; per-shard ragged tails are padded
    with the shard's base row and ``valid=False``. Shuffle is per-shard
    (seeded by (seed, epoch, shard)) — the global batch still mixes D
    spread-out dataset segments every step."""
    if batch_size % n_shards:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"{n_shards} shards")
    b_local = batch_size // n_shards
    rps = -(-n // n_shards)
    shard_rows = []
    for d in range(n_shards):
        rows = np.arange(d * rps, min((d + 1) * rps, n), dtype=np.int32)
        if shuffle and len(rows):
            np.random.default_rng((seed, epoch, d)).shuffle(rows)
        shard_rows.append(rows)
    for bi in range(-(-rps // b_local)):
        idx = np.zeros((batch_size,), np.int32)
        valid = np.zeros((batch_size,), dtype=bool)
        for d in range(n_shards):
            rows = shard_rows[d][bi * b_local:(bi + 1) * b_local]
            base = d * b_local
            idx[base:base + len(rows)] = rows
            idx[base + len(rows):base + b_local] = d * rps  # in-shard pad
            valid[base:base + len(rows)] = True
        yield {"indices": idx, "valid": valid}


def make_index_loader(n: int, batch_size: int, shuffle: bool = False,
                      seed: int = 0, drop_last: bool = False
                      ) -> Iterator[Dict[str, np.ndarray]]:
    """Index-only loader: yields {indices (B,) i32, valid (B,) bool} with
    the SAME order/padding semantics as ``pipeline.make_loader`` (seeded
    shuffle depends only on (seed, n); ragged tail padded with index 0 +
    valid mask) so metrics and coverage match the file-based path."""
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    num_batches = n // batch_size if drop_last else -(-n // batch_size)
    for bi in range(num_batches):
        idx = order[bi * batch_size:(bi + 1) * batch_size]
        count = len(idx)
        pad = batch_size - count
        if pad:
            idx = np.concatenate([idx, np.zeros((pad,), idx.dtype)])
        valid = np.zeros((batch_size,), dtype=bool)
        valid[:count] = True
        yield {"indices": idx.astype(np.int32), "valid": valid}
