"""Clean-room WordPiece tokenizer (BERT-uncased semantics), no network.

The reference tokenizes with HF ``DistilBertTokenizer.from_pretrained``
(reference: main.py:89, dataset.py:19-21), which needs a downloaded vocab.
This implementation consumes the same ``vocab.txt`` format, reproduces HF
``BertTokenizer`` output token-for-token (verified in tests against a local
HF tokenizer built from the same vocab file), and adds a small corpus-driven
vocab builder for fully-offline runs.

Key reference semantics preserved:
* ``encode_batch(captions, padding=True, truncation=True, max_length=200)``
  pads to the LONGEST SEQUENCE IN THE LIST — the reference tokenizes the
  whole dataset up-front, so padding width is a dataset-global property
  (dataset.py:19-21). ``fixed_length`` is the TPU-friendly alternative
  (static shapes across hosts; see SURVEY.md §7 hard parts).

Implementation is pure Python; a C++ fast path (native/wordpiece.cpp via
ctypes) accelerates bulk encoding when built — same algorithm, same outputs.
"""

from __future__ import annotations

import collections
import ctypes
import pathlib
import unicodedata
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

_NATIVE_LIB = None  # None = not probed; False = unavailable


def _native_lib():
    """Load native/libwordpiece.so (built by ``make -C native``) if present."""
    global _NATIVE_LIB
    if _NATIVE_LIB is None:
        lib = False
        cand = (pathlib.Path(__file__).resolve().parents[2] / "native"
                / "libwordpiece.so")
        if cand.exists():
            try:
                lib = ctypes.CDLL(str(cand))
                lib.wp_new.restype = ctypes.c_void_p
                lib.wp_new.argtypes = [ctypes.c_char_p, ctypes.c_int64]
                lib.wp_free.argtypes = [ctypes.c_void_p]
                lib.wp_encode_words.restype = ctypes.c_int64
                lib.wp_encode_words.argtypes = [
                    ctypes.c_void_p, ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
                lib.wp_encode_corpus_ascii.restype = ctypes.c_int64
                lib.wp_encode_corpus_ascii.argtypes = [
                    ctypes.c_void_p, ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                    ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
            except OSError:
                lib = False
        _NATIVE_LIB = lib
    return _NATIVE_LIB


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or \
       (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF) or
            (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F) or
            (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF) or
            (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def basic_tokenize(text: str, lowercase: bool = True) -> List[str]:
    """Whitespace/punctuation/CJK splitting with accent stripping."""
    # Clean: drop control chars and invalid codepoints, normalize whitespace.
    cleaned = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        cleaned.append(" " if _is_whitespace(ch) else ch)
    text = "".join(cleaned)

    # CJK chars become standalone tokens.
    spaced = []
    for ch in text:
        if _is_cjk(ord(ch)):
            spaced.append(f" {ch} ")
        else:
            spaced.append(ch)
    text = "".join(spaced)

    tokens: List[str] = []
    for tok in text.split():
        if lowercase:
            tok = tok.lower()
            tok = "".join(c for c in unicodedata.normalize("NFD", tok)
                          if unicodedata.category(c) != "Mn")
        # Split punctuation into separate tokens.
        cur: List[str] = []
        for ch in tok:
            if _is_punctuation(ch):
                if cur:
                    tokens.append("".join(cur))
                    cur = []
                tokens.append(ch)
            else:
                cur.append(ch)
        if cur:
            tokens.append("".join(cur))
    return tokens


class WordPieceTokenizer:
    """BERT-uncased-compatible tokenizer over an HF-format vocab.txt."""

    def __init__(self, vocab: Dict[str, int], lowercase: bool = True,
                 unk_token: str = "[UNK]", cls_token: str = "[CLS]",
                 sep_token: str = "[SEP]", pad_token: str = "[PAD]",
                 max_input_chars_per_word: int = 100,
                 use_native: str = "auto"):
        self.vocab = vocab
        self.ids_to_tokens = {i: t for t, i in vocab.items()}
        self.lowercase = lowercase
        self.unk_token = unk_token
        self.cls_token = cls_token
        self.sep_token = sep_token
        self.pad_token = pad_token
        self.max_input_chars_per_word = max_input_chars_per_word
        self._native = None
        if use_native in ("auto", "always"):
            lib = _native_lib()
            if lib:
                tokens = [t for t, _ in sorted(vocab.items(),
                                               key=lambda kv: kv[1])]
                buf = "\n".join(tokens).encode("utf-8")
                self._native = (lib, lib.wp_new(buf, len(buf)))
            elif use_native == "always":
                raise RuntimeError(
                    "native wordpiece requested but native/libwordpiece.so "
                    "is not built (run: make -C native)")

    def __del__(self):
        native = getattr(self, "_native", None)
        if native:
            native[0].wp_free(native[1])

    # -- construction ---------------------------------------------------
    @classmethod
    def from_vocab_file(cls, path: str, **kw) -> "WordPieceTokenizer":
        vocab: Dict[str, int] = collections.OrderedDict()
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, **kw)

    @property
    def pad_id(self) -> int:
        return self.vocab[self.pad_token]

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    # -- core algorithm ---------------------------------------------------
    def _wordpiece(self, word: str) -> List[str]:
        if len(word) > self.max_input_chars_per_word:
            return [self.unk_token]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        out: List[str] = []
        for tok in basic_tokenize(text, self.lowercase):
            out.extend(self._wordpiece(tok))
        return out

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        unk = self.vocab[self.unk_token]
        return [self.vocab.get(t, unk) for t in tokens]

    # -- encoding ---------------------------------------------------------
    def _native_corpus_ascii(self, texts: Sequence[str]) -> List[List[int]]:
        """Bulk-encode pure-ASCII texts in one C++ call."""
        lib, handle = self._native
        data = "".join(texts).encode("ascii")
        n = len(texts)
        offsets = (ctypes.c_int64 * (n + 1))()
        pos = 0
        for i, t in enumerate(texts):
            offsets[i] = pos
            pos += len(t)
        offsets[n] = pos
        cap = len(data) + 8 * n + 64
        out = (ctypes.c_int32 * cap)()
        counts = (ctypes.c_int32 * n)()
        total = lib.wp_encode_corpus_ascii(handle, data, offsets, n,
                                           int(self.lowercase), out, cap,
                                           counts)
        if total > cap:
            cap = int(total)
            out = (ctypes.c_int32 * cap)()
            lib.wp_encode_corpus_ascii(handle, data, offsets, n,
                                       int(self.lowercase), out, cap, counts)
        result: List[List[int]] = []
        pos = 0
        for i in range(n):
            c = counts[i]
            result.append(out[pos:pos + c])
            pos += c
        return result

    def _content_ids(self, text: str) -> List[int]:
        if self._native is not None:
            if text.isascii():
                return self._native_corpus_ascii([text])[0]
            lib, handle = self._native
            words = " ".join(basic_tokenize(text, self.lowercase))
            encoded = words.encode("utf-8")
            cap = max(len(encoded) + 8, 64)
            out = (ctypes.c_int32 * cap)()
            n = lib.wp_encode_words(handle, encoded, out, cap)
            if n > cap:  # pathological caption longer than its bytes+8
                out = (ctypes.c_int32 * n)()
                n = lib.wp_encode_words(handle, encoded, out, n)
            return list(out[:n])
        return self.convert_tokens_to_ids(self.tokenize(text))

    def _content_ids_batch(self, texts: Sequence[str]) -> List[List[int]]:
        if self._native is None:
            return [self._content_ids(t) for t in texts]
        ascii_idx = [i for i, t in enumerate(texts) if t.isascii()]
        result: List[Optional[List[int]]] = [None] * len(texts)
        if ascii_idx:
            bulk = self._native_corpus_ascii([texts[i] for i in ascii_idx])
            for i, ids in zip(ascii_idx, bulk):
                result[i] = ids
        for i, t in enumerate(texts):
            if result[i] is None:
                result[i] = self._content_ids(t)
        return result  # type: ignore[return-value]

    def encode(self, text: str, max_length: Optional[int] = None
               ) -> List[int]:
        """[CLS] tokens [SEP], truncated to max_length total."""
        ids = self._content_ids(text)
        if max_length is not None:
            ids = ids[: max_length - 2]
        return ([self.vocab[self.cls_token]] + ids
                + [self.vocab[self.sep_token]])

    def encode_batch(self, texts: Sequence[str],
                     max_length: Optional[int] = None,
                     fixed_length: Optional[int] = None
                     ) -> Dict[str, List[List[int]]]:
        """HF-style batch encode: ``padding=True`` semantics (pad to the
        longest in THIS list) unless ``fixed_length`` pins a static width."""
        cls_id = self.vocab[self.cls_token]
        sep_id = self.vocab[self.sep_token]
        cut = (max_length - 2) if max_length is not None else None
        encoded = [[cls_id] + list(ids[:cut]) + [sep_id]
                   for ids in self._content_ids_batch(texts)]
        width = fixed_length if fixed_length is not None else max(
            (len(e) for e in encoded), default=0)
        pad = self.pad_id
        input_ids, attention_mask = [], []
        for e in encoded:
            e = e[:width]
            mask = [1] * len(e) + [0] * (width - len(e))
            input_ids.append(e + [pad] * (width - len(e)))
            attention_mask.append(mask)
        return {"input_ids": input_ids, "attention_mask": attention_mask}

    def decode(self, ids: Sequence[int], skip_special: bool = True) -> str:
        special = {self.cls_token, self.sep_token, self.pad_token}
        toks = [self.ids_to_tokens.get(int(i), self.unk_token) for i in ids]
        if skip_special:
            toks = [t for t in toks if t not in special]
        text = " ".join(toks).replace(" ##", "")
        return text


def build_vocab(corpus: Iterable[str], vocab_size: int = 8192,
                min_frequency: int = 2, lowercase: bool = True
                ) -> Dict[str, int]:
    """Frequency-based WordPiece vocab builder for fully-offline runs.

    Simple iterative scheme: start from characters, greedily add the most
    frequent whole words, then the most frequent prefixes/suffix pieces.
    Not BPE-optimal, but produces a valid vocab this tokenizer (and HF's)
    can consume.
    """
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    word_counts: collections.Counter = collections.Counter()
    for text in corpus:
        for tok in basic_tokenize(text, lowercase):
            word_counts[tok] += 1

    vocab: Dict[str, int] = {t: i for i, t in enumerate(specials)}

    def add(token: str) -> None:
        if token not in vocab and len(vocab) < vocab_size:
            vocab[token] = len(vocab)

    # All single characters (as starts and continuations) for coverage.
    char_counts: collections.Counter = collections.Counter()
    for w, c in word_counts.items():
        for j, ch in enumerate(w):
            char_counts[ch if j == 0 else "##" + ch] += c
    for ch, _ in char_counts.most_common():
        add(ch)

    # Most frequent whole words.
    for w, c in word_counts.most_common():
        if c < min_frequency:
            break
        add(w)

    # Frequent sub-pieces (prefixes + '##'-continuations) of remaining mass.
    piece_counts: collections.Counter = collections.Counter()
    for w, c in word_counts.items():
        for ln in range(2, min(len(w), 12)):
            piece_counts[w[:ln]] += c
            piece_counts["##" + w[ln:]] += c
    for piece, c in piece_counts.most_common():
        if len(vocab) >= vocab_size:
            break
        if c >= min_frequency:
            add(piece)
    return vocab


def save_vocab(vocab: Dict[str, int], path: str) -> None:
    items = sorted(vocab.items(), key=lambda kv: kv[1])
    with open(path, "w", encoding="utf-8") as f:
        for tok, _ in items:
            f.write(tok + "\n")
