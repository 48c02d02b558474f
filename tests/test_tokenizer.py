"""WordPiece tokenizer parity vs HF BertTokenizer over the same vocab file."""

import numpy as np
import pytest
import transformers

from mae_clip_tpu.data.tokenizer import (WordPieceTokenizer, basic_tokenize,
                                         build_vocab, save_vocab)

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "a", "the", "dog", "cat", "run", "##ning", "##s", "jump", "##ed",
         "photo", "of", "on", "grass", "green", ",", ".", "!", "un",
         "##believ", "##able", "quick", "brown", "fox"]

SENTENCES = [
    "A dog running on the green grass.",
    "The quick brown fox jumped!",
    "Unbelievable, a cat runs.",
    "a photo of a dog",
    "zebra xylophone",          # unknown words -> [UNK]
    "THE DOG, THE CAT!",        # case folding
    "café dog",            # accent stripping
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def pair(vocab_file):
    ours = WordPieceTokenizer.from_vocab_file(vocab_file)
    hf = transformers.BertTokenizer(vocab_file=vocab_file,
                                    do_lower_case=True)
    return ours, hf


def test_tokenize_parity(pair):
    ours, hf = pair
    for s in SENTENCES:
        assert ours.tokenize(s) == hf.tokenize(s), s


def test_encode_ids_parity(pair):
    ours, hf = pair
    for s in SENTENCES:
        expected = hf(s)["input_ids"]
        assert ours.encode(s) == expected, s


def test_batch_padding_semantics(pair):
    """padding=True pads to the longest sequence in the list (the reference
    tokenizes the whole dataset at once, dataset.py:19-21)."""
    ours, hf = pair
    enc_hf = hf(SENTENCES, padding=True, truncation=True, max_length=16)
    enc_ours = ours.encode_batch(SENTENCES, max_length=16)
    assert enc_ours["input_ids"] == enc_hf["input_ids"]
    assert enc_ours["attention_mask"] == enc_hf["attention_mask"]


def test_truncation(pair):
    ours, hf = pair
    long = "dog cat " * 50
    enc_hf = hf(long, truncation=True, max_length=10)["input_ids"]
    assert ours.encode(long, max_length=10) == enc_hf
    assert len(ours.encode(long, max_length=10)) == 10


def test_fixed_length_static_shape(pair):
    ours, _ = pair
    enc = ours.encode_batch(SENTENCES, max_length=32, fixed_length=32)
    arr = np.asarray(enc["input_ids"])
    assert arr.shape == (len(SENTENCES), 32)


def test_basic_tokenize_rules():
    assert basic_tokenize("Hello, WORLD!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("café") == ["cafe"]


def test_build_vocab_and_roundtrip(tmp_path):
    corpus = ["a dog runs on grass", "the dog jumped", "a cat runs",
              "dogs running"] * 3
    vocab = build_vocab(corpus, vocab_size=64, min_frequency=1)
    assert "[UNK]" in vocab and "[CLS]" in vocab
    path = tmp_path / "v.txt"
    save_vocab(vocab, str(path))
    tok = WordPieceTokenizer.from_vocab_file(str(path))
    ids = tok.encode("the dog runs")
    assert ids[0] == vocab["[CLS]"] and ids[-1] == vocab["[SEP]"]
    assert tok.vocab[tok.unk_token] not in ids[1:-1]  # all in-vocab
    # decode inverts (modulo case)
    assert "dog" in tok.decode(ids)
