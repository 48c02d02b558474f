"""ctypes binding for the native C++ image pipeline (native/imagepipe.cpp).

The production TPU input path ships pre-patchified uint8 patches
(``(B, N, P*P*C)``; see images.py:patchify_host for why) with normalization
fused into the jitted step. This module provides the native fast path for
producing those patches straight from JPEG files: fused libjpeg decode (with
DCT scaling) -> cv2-convention bilinear resize -> patch layout, one C pass
per image, threaded across the batch. Equivalent host math lives in
images.decode_image + host-side resize + patchify_host (reference semantics:
dataset.py:30-32,44-58); tests pin the two paths to within +-1/255 per pixel
(u8 rounding). Falls back cleanly when the .so has not been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import pathlib
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_LIB = None  # None = not probed; False = unavailable


def _native_lib():
    global _NATIVE_LIB
    if _NATIVE_LIB is None:
        lib = False
        cand = (pathlib.Path(__file__).resolve().parents[2] / "native"
                / "libimagepipe.so")
        if cand.exists():
            try:
                lib = ctypes.CDLL(str(cand))
                lib.ip_jpeg_to_patches.restype = ctypes.c_int
                lib.ip_jpeg_to_patches.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8)]
                lib.ip_rgb_to_patches.restype = ctypes.c_int
                lib.ip_rgb_to_patches.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8)]
                lib.ip_batch_files.restype = ctypes.c_int
                lib.ip_batch_files.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_uint8)]
            except OSError:
                lib = False
        _NATIVE_LIB = lib
    return _NATIVE_LIB


def native_available() -> bool:
    return bool(_native_lib())


def _num_patches(size: int, patch: int) -> int:
    assert size % patch == 0, (size, patch)
    return (size // patch) ** 2


def jpeg_to_patches(data: bytes, size: int = 224,
                    patch: int = 16) -> Optional[np.ndarray]:
    """Decode one JPEG byte string to (N, P*P*3) uint8 patches.

    Returns None on decode failure (caller decides the fallback)."""
    lib = _native_lib()
    if not lib:
        return None
    n = _num_patches(size, patch)
    out = np.empty((n, patch * patch * 3), dtype=np.uint8)
    buf = np.frombuffer(data, dtype=np.uint8)
    rc = lib.ip_jpeg_to_patches(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        size, patch, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def rgb_to_patches(img: np.ndarray, size: int = 224,
                   patch: int = 16) -> Optional[np.ndarray]:
    """Resize+patchify an RGB uint8 HWC array natively."""
    lib = _native_lib()
    if not lib:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3, img.shape
    n = _num_patches(size, patch)
    out = np.empty((n, patch * patch * 3), dtype=np.uint8)
    rc = lib.ip_rgb_to_patches(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        size, patch, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def batch_files_to_patches(
        paths: Sequence[str], size: int = 224, patch: int = 16,
        n_threads: int = 8) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode+resize+patchify a batch of JPEG files with the C thread pool.

    Returns (patches (B, N, P*P*3) uint8, failed (B,) bool) — failed rows
    are zeroed (callers mask them via the loader's ``valid`` flags) — or
    None when the native library is unavailable.
    """
    lib = _native_lib()
    if not lib:
        return None
    b = len(paths)
    n = _num_patches(size, patch)
    out = np.empty((b, n, patch * patch * 3), dtype=np.uint8)
    fail = np.zeros((b,), dtype=np.uint8)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    lib.ip_batch_files(
        arr, b, size, patch, int(n_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        fail.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, fail.astype(bool)
