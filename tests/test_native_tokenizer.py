"""Native (C++) WordPiece fast path: bit-identical to the Python path."""

import subprocess
import pathlib

import numpy as np
import pytest

from mae_clip_tpu.data.tokenizer import (WordPieceTokenizer, build_vocab,
                                         _native_lib)

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", str(REPO / "native")], check=True,
                   capture_output=True)
    # Reset the probe cache in case an earlier import saw no lib.
    import mae_clip_tpu.data.tokenizer as tk
    tk._NATIVE_LIB = None
    yield


CORPUS = ["a dog running on the green grass",
          "the quick brown fox jumped over it",
          "an unbelievable photograph of a cat",
          "zebra xylophone qwerty"] * 2


def _pair():
    vocab = build_vocab(CORPUS, vocab_size=128, min_frequency=1)
    py = WordPieceTokenizer(vocab, use_native="never")
    nat = WordPieceTokenizer(vocab, use_native="always")
    assert nat._native is not None
    return py, nat


def test_native_lib_builds_and_loads():
    assert _native_lib(), "libwordpiece.so failed to load"


def test_native_matches_python_encode():
    py, nat = _pair()
    texts = CORPUS + [
        "Totally-unseen WORDS, with Punctuation!",
        "café façade naïve",          # accents stripped in basic_tokenize
        "",                            # empty caption
        "a",                           # single token
        "supercalifragilistic",        # forced [UNK]
    ]
    for t in texts:
        assert nat.encode(t) == py.encode(t), t
        assert nat.encode(t, max_length=8) == py.encode(t, max_length=8), t


def test_native_matches_python_batch():
    py, nat = _pair()
    a = py.encode_batch(CORPUS, max_length=32)
    b = nat.encode_batch(CORPUS, max_length=32)
    assert a == b


def test_native_is_faster_on_bulk():
    """Sanity: the native path should not be slower on a large batch.

    Best-of-3 per arm: single timings flake under co-tenant load (this
    suite shares one CPU core with background jobs)."""
    import time
    vocab = build_vocab(CORPUS, vocab_size=128, min_frequency=1)
    texts = CORPUS * 500   # 4k captions
    py = WordPieceTokenizer(vocab, use_native="never")
    nat = WordPieceTokenizer(vocab, use_native="always")

    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_py = best_of(lambda: py.encode_batch(texts))
    t_nat = best_of(lambda: nat.encode_batch(texts))
    # Loose bound: native must be at least ~1.3x faster.
    assert t_nat < t_py / 1.3, (t_py, t_nat)
