"""Fast CLI-surface tests (host-only subcommands; model-bearing subcommands
are exercised end-to-end on hardware, see PARITY.md)."""

import json

import numpy as np
import pytest

from mae_clip_tpu import cli


def _coco_json(tmp_path):
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"}],
        "annotations": [{"image_id": 1, "caption": "one fish"},
                        {"image_id": 2, "caption": "two fish"},
                        {"image_id": 1, "caption": "red fish"}],
    }
    p = tmp_path / "cap.json"
    p.write_text(json.dumps(ann))
    return p


def test_data_coco_writes_reference_order_csv(tmp_path, capsys):
    """Rows come out one-per-annotation in annotation order with repeated
    image names (reference coco_captions_to_df.py:17-25 semantics)."""
    src = _coco_json(tmp_path)
    out = tmp_path / "captions.csv"
    cli.main(["data-coco", str(src), "--out", str(out)])
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats == {"rows": 3, "images": 2, "out": str(out)}
    lines = out.read_text().strip().splitlines()
    assert lines == ["image,caption", "a.jpg,one fish", "b.jpg,two fish",
                     "a.jpg,red fish"]


def test_data_coco_limit_matches_test_fixture(tmp_path, capsys):
    src = _coco_json(tmp_path)
    cli.main(["data-coco", str(src), "--limit", "2"])
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["rows"] == 2 and stats["out"] is None


def test_build_vocab_from_coco_json(tmp_path, capsys):
    src = _coco_json(tmp_path)
    out = tmp_path / "vocab.txt"
    cli.main(["build-vocab", str(src), str(out), "--vocab-size", "64"])
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["out"] == str(out) and stats["vocab_size"] <= 64
    # The produced vocab round-trips through the tokenizer loader.
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer
    tok = WordPieceTokenizer.from_vocab_file(str(out))
    enc = tok.encode_batch(["one fish"], max_length=8)
    assert np.asarray(enc["input_ids"]).shape[0] == 1
