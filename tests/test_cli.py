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


def test_cli_train_end_to_end_with_text_cache(tmp_path, capsys):
    """Full `cli train` drive on a synthetic Flickr-style dataset, with the
    frozen-text feature cache active (the flagship production path) and
    the 8-virtual-device mesh."""
    import json as json_mod

    import cv2
    import numpy as np

    data = tmp_path / "data"
    img_dir = data / "Images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["id,image,caption"]
    words = ["dog", "cat", "red", "ball", "runs", "sits"]
    for i in range(10):
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))
        caption = " ".join(rng.choice(words, size=4))
        rows.append(f"{i},{name},a photo of {caption}")
    (data / "captions.csv").write_text("\n".join(rows))

    vocab = tmp_path / "vocab.txt"
    cli.main(["build-vocab", str(data / "captions.csv"), str(vocab),
              "--vocab-size", "64"])
    capsys.readouterr()

    run_dir = tmp_path / "run"
    cli.main([
        "train", "--captions-dir", str(data),
        "--set", f"vocab_file={vocab}",
        "--set", f"image_path={img_dir}",
        "--set", "model_name=vit_s16", "--set", "image_embedding=384",
        "--set", "batch_size=8", "--set", "epochs=1", "--set", "size=32",
        "--set", "max_length=12", "--set", "compute_dtype=float32",
        "--set", "mae.enabled=true", "--set", "mae.decoder_dim=16",
        "--set", "mae.decoder_depth=1", "--set", "mae.decoder_heads=2",
        "--set", "text_trainable=false", "--set",
        "frozen_text_eval_mode=true",
        "--set", f"checkpoints={run_dir}",
        "--set", f"logdir={tmp_path / 'logs'}",
    ])
    out = capsys.readouterr().out
    assert "cached frozen-text features" in out
    result = json_mod.loads(out.strip().splitlines()[-1])
    assert np.isfinite(result["final_train_loss"])
    assert np.isfinite(result["final_valid_loss"])
    assert any(d.name.isdigit() for d in run_dir.iterdir())


def test_cli_data_shards_and_shard_training(tmp_path, capsys):
    """data-shards packs a captions dir; train --shards streams it."""
    import json as json_mod

    import cv2
    import numpy as np

    data = tmp_path / "data"
    img_dir = data / "Images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    rows = ["id,image,caption"]
    for i in range(12):
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))
        rows.append(f"{i},{name},a photo number {i}")
    (data / "captions.csv").write_text("\n".join(rows))

    shard_dir = tmp_path / "shards"
    cli.main(["data-shards", "--captions-dir", str(data),
              "--image-path", str(img_dir), "--shard-size", "5",
              str(shard_dir)])
    out = json_mod.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["shards"] == 3 and out["records"] == 12

    vocab = tmp_path / "vocab.txt"
    cli.main(["build-vocab", str(data / "captions.csv"), str(vocab),
              "--vocab-size", "64"])
    capsys.readouterr()

    run_dir = tmp_path / "run"
    cli.main([
        "train", "--shards", str(shard_dir / "shard-*.tar"),
        "--set", f"vocab_file={vocab}",
        "--set", "model_name=vit_s16", "--set", "image_embedding=384",
        "--set", "batch_size=8", "--set", "epochs=1", "--set", "size=32",
        "--set", "max_length=8", "--set", "compute_dtype=float32",
        "--set", "mae.enabled=true", "--set", "mae.decoder_dim=16",
        "--set", "mae.decoder_depth=1", "--set", "mae.decoder_heads=2",
        "--set", f"checkpoints={run_dir}",
        "--set", f"logdir={tmp_path / 'logs'}",
    ])
    result = json_mod.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["final_train_loss"])
    assert any(d.name.isdigit() for d in run_dir.iterdir())


def test_cli_embed_exports_npz(tmp_path, capsys):
    """`cli embed` bulk-exports unit-norm image+text embeddings to .npz
    (ragged tails on both modalities; checkpoint in the bare
    StandardCheckpointer form that `import-pth` writes)."""
    import cv2
    import jax
    import orbax.checkpoint as ocp

    from mae_clip_tpu.config import Config
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(2)
    for i in range(5):
        cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))
    texts = tmp_path / "texts.txt"
    texts.write_text("a red dog\n\na blue cat\nfish\n")  # blank line skipped
    captions = tmp_path / "captions.csv"
    captions.write_text("image,caption\nim0.jpg,a red dog and a blue cat\n")
    vocab = tmp_path / "vocab.txt"
    cli.main(["build-vocab", str(captions), str(vocab),
              "--vocab-size", "64"])
    capsys.readouterr()

    sets = ["--set", f"vocab_file={vocab}", "--set", "model_name=vit_s16",
            "--set", "image_embedding=384", "--set", "size=32",
            "--set", "batch_size=4", "--set", "max_length=8",
            "--set", "compute_dtype=float32"]
    cfg = Config(model_name="vit_s16", image_embedding=384, size=32,
                 batch_size=4, max_length=8, compute_dtype="float32",
                 vocab_file=str(vocab))
    tok = WordPieceTokenizer.from_vocab_file(str(vocab))
    model, _ = cli._build_model(cfg, vocab_size=tok.vocab_size)
    batch = {"image": np.zeros((4, 32, 32, 3), np.float32),
             "input_ids": np.zeros((4, 8), np.int32),
             "attention_mask": np.ones((4, 8), np.int32)}
    variables = jax.jit(
        lambda r, b: model.init(r, b, mask_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0), batch)
    ckpt = tmp_path / "ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt), {"params": variables["params"]})
    ckptr.wait_until_finished()

    out = tmp_path / "emb.npz"
    cli.main(["embed", "--checkpoint", str(ckpt), "--images", str(img_dir),
              "--texts", str(texts), "--output", str(out), *sets])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["images"] == 5 and report["texts"] == 3
    assert report["dim"] == 256

    z = np.load(out)
    assert z["image_embeddings"].shape == (5, 256)
    assert z["text_embeddings"].shape == (3, 256)
    np.testing.assert_allclose(
        np.linalg.norm(z["image_embeddings"], axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(z["text_embeddings"], axis=1), 1.0, atol=1e-5)
    assert list(z["image_files"]) == [f"im{i}.jpg" for i in range(5)]
    assert list(z["texts"]) == ["a red dog", "a blue cat", "fish"]


def test_cli_embed_from_shards(tmp_path, capsys):
    """`cli embed --shards`: every tar record's image AND caption embedded,
    unit-norm, key-aligned."""
    import cv2
    import jax
    import orbax.checkpoint as ocp

    from mae_clip_tpu.config import Config
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer

    data = tmp_path / "data"
    img_dir = data / "Images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    rows = ["id,image,caption"]
    for i in range(7):
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))
        rows.append(f"{i},{name},a photo number {i}")
    (data / "captions.csv").write_text("\n".join(rows))

    shard_dir = tmp_path / "shards"
    cli.main(["data-shards", "--captions-dir", str(data),
              "--image-path", str(img_dir), "--shard-size", "4",
              str(shard_dir)])
    vocab = tmp_path / "vocab.txt"
    cli.main(["build-vocab", str(data / "captions.csv"), str(vocab),
              "--vocab-size", "64"])
    capsys.readouterr()

    sets = ["--set", f"vocab_file={vocab}", "--set", "model_name=vit_s16",
            "--set", "image_embedding=384", "--set", "size=32",
            "--set", "batch_size=4", "--set", "max_length=8",
            "--set", "compute_dtype=float32"]
    cfg = Config(model_name="vit_s16", image_embedding=384, size=32,
                 batch_size=4, max_length=8, compute_dtype="float32",
                 vocab_file=str(vocab))
    tok = WordPieceTokenizer.from_vocab_file(str(vocab))
    model, _ = cli._build_model(cfg, vocab_size=tok.vocab_size)
    batch = {"image": np.zeros((4, 32, 32, 3), np.float32),
             "input_ids": np.zeros((4, 8), np.int32),
             "attention_mask": np.ones((4, 8), np.int32)}
    variables = jax.jit(
        lambda r, b: model.init(r, b, mask_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0), batch)
    ckpt = tmp_path / "ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt), {"params": variables["params"]})
    ckptr.wait_until_finished()

    out = tmp_path / "emb.npz"
    cli.main(["embed", "--checkpoint", str(ckpt),
              "--shards", str(shard_dir / "shard-*.tar"),
              "--output", str(out), *sets])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["records"] == 7 and report["dim"] == 256

    z = np.load(out)
    assert z["image_embeddings"].shape == (7, 256)
    assert z["text_embeddings"].shape == (7, 256)
    np.testing.assert_allclose(
        np.linalg.norm(z["image_embeddings"], axis=1), 1.0, atol=1e-5)
    assert len(z["keys"]) == 7 and len(set(z["keys"].tolist())) == 7
    assert all(t.startswith("a photo number") for t in z["texts"])


def test_cli_train_with_device_augmentation(tmp_path, capsys):
    """`cli train --augment`: train images decode once at
    mae.aug_source_size NHWC and get per-step device-side crops; valid
    stays fixed-geometry. Covers the init-example shape rewrite and the
    make_ds geometry switch."""
    import json as json_mod

    import cv2
    import numpy as np

    data = tmp_path / "data"
    img_dir = data / "Images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    rows = ["id,image,caption"]
    words = ["dog", "cat", "red", "ball"]
    for i in range(10):
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))
        caption = " ".join(rng.choice(words, size=3))
        rows.append(f"{i},{name},a photo of {caption}")
    (data / "captions.csv").write_text("\n".join(rows))

    vocab = tmp_path / "vocab.txt"
    cli.main(["build-vocab", str(data / "captions.csv"), str(vocab),
              "--vocab-size", "64"])
    capsys.readouterr()

    run_dir = tmp_path / "run"
    cli.main([
        "train", "--captions-dir", str(data), "--augment",
        "--set", f"vocab_file={vocab}",
        "--set", f"image_path={img_dir}",
        "--set", "model_name=vit_s16", "--set", "image_embedding=384",
        "--set", "batch_size=8", "--set", "epochs=1", "--set", "size=32",
        "--set", "mae.aug_source_size=48",
        "--set", "max_length=12", "--set", "compute_dtype=float32",
        "--set", "text_trainable=false", "--set",
        "frozen_text_eval_mode=true",
        "--set", f"checkpoints={run_dir}",
        "--set", f"logdir={tmp_path / 'logs'}",
    ])
    out = capsys.readouterr().out
    result = json_mod.loads(out.strip().splitlines()[-1])
    assert np.isfinite(result["final_train_loss"])
    assert np.isfinite(result["final_valid_loss"])


def test_cli_train_resume_continues(tmp_path, capsys):
    """`cli train --resume`: a finished 1-epoch run restarted with
    epochs=2 restores the checkpoint and trains only the remaining epoch
    (epoch-keyed loader factories make the shuffles deterministic)."""
    import json as json_mod

    import cv2
    import numpy as np

    data = tmp_path / "data"
    img_dir = data / "Images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(2)
    rows = ["id,image,caption"]
    for i in range(10):
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))
        rows.append(f"{i},{name},a photo of thing {i % 3}")
    (data / "captions.csv").write_text("\n".join(rows))

    vocab = tmp_path / "vocab.txt"
    cli.main(["build-vocab", str(data / "captions.csv"), str(vocab),
              "--vocab-size", "64"])
    capsys.readouterr()

    run_dir = tmp_path / "run"
    base = [
        "train", "--captions-dir", str(data),
        "--set", f"vocab_file={vocab}",
        "--set", f"image_path={img_dir}",
        "--set", "model_name=vit_s16", "--set", "image_embedding=384",
        "--set", "batch_size=8", "--set", "size=32",
        "--set", "max_length=12", "--set", "compute_dtype=float32",
        "--set", "text_trainable=false",
        "--set", "frozen_text_eval_mode=true",
        "--set", "checkpoint_every_steps=2",
        "--set", f"checkpoints={run_dir}",
        "--set", f"logdir={tmp_path / 'logs'}",
    ]
    cli.main(base + ["--set", "epochs=1"])
    out1 = capsys.readouterr().out
    assert (run_dir / "steps").is_dir()      # rolling step checkpoints

    cli.main(base + ["--set", "epochs=2", "--resume"])
    out2 = capsys.readouterr().out
    assert "resumed: epoch 1" in out2
    result = json_mod.loads(out2.strip().splitlines()[-1])
    assert np.isfinite(result["final_train_loss"])


def test_cli_train_large_batch_mesh_gradcache_equals_giant_batch(
        tmp_path, capsys):
    """The 32k recipe's GradCache accumulation is reachable from the
    PRODUCTION path: `cli train --preset large_batch_mesh --set
    accum_steps=2` (Config.accum_steps -> Trainer -> make_train_step) on
    the 8-virtual-device mesh produces the same per-epoch losses as the
    identical run with accum_steps=1 (the giant-batch step) — GradCache
    accumulation is exact, not an approximation (arXiv:2101.06983;
    reference loss at global batch: CLIP.py:34)."""
    import json as json_mod

    import cv2
    import numpy as np

    data = tmp_path / "data"
    img_dir = data / "Images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    rows = ["id,image,caption"]
    words = ["dog", "cat", "red", "ball", "runs", "sits"]
    for i in range(20):
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))
        rows.append(f"{i},{name},a photo of "
                    + " ".join(rng.choice(words, size=3)))
    (data / "captions.csv").write_text("\n".join(rows))

    vocab = tmp_path / "vocab.txt"
    cli.main(["build-vocab", str(data / "captions.csv"), str(vocab),
              "--vocab-size", "64"])
    capsys.readouterr()

    def run(accum: int, tag: str):
        cli.main([
            "train", "--preset", "large_batch_mesh",
            "--captions-dir", str(data),
            "--set", f"vocab_file={vocab}",
            "--set", f"image_path={img_dir}",
            "--set", "batch_size=16", "--set", "epochs=2",
            "--set", "size=32", "--set", "max_length=12",
            "--set", "compute_dtype=float32", "--set", "dropout=0.0",
            "--set", "loss_chunk_size=2",
            "--set", "mae.decoder_dim=16", "--set", "mae.decoder_depth=1",
            "--set", "mae.decoder_heads=2",
            "--set", f"accum_steps={accum}",
            "--set", f"checkpoints={tmp_path / tag / 'ckpt'}",
            "--set", f"logdir={tmp_path / tag / 'logs'}",
        ])
        return json_mod.loads(capsys.readouterr().out.strip()
                              .splitlines()[-1])

    giant = run(1, "giant")
    accum = run(2, "accum")
    # Identical seed/batches/masking recipe and dropout=0: the two-pass
    # GradCache step must reproduce the giant-batch trajectory (same
    # optimizer updates), not merely converge similarly.
    np.testing.assert_allclose(accum["final_train_loss"],
                               giant["final_train_loss"], rtol=1e-5)
    np.testing.assert_allclose(accum["final_valid_loss"],
                               giant["final_valid_loss"], rtol=1e-5)


def test_cli_train_device_data_without_valid_store(tmp_path, capsys):
    """`device_data_eval=false`: train runs from the HBM store, validation
    from the file loader (frees the valid store's HBM at 100k-row scale),
    and the deduped image staging reports fewer staged bytes than rows."""
    import json as json_mod

    import cv2
    import numpy as np

    data = tmp_path / "data"
    img_dir = data / "Images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(4)
    rows = ["id,image,caption"]
    # 6 unique images x 2 captions each = 12 rows (dedup territory).
    for i in range(6):
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))
        rows.append(f"{2*i},{name},a photo of thing {i}")
        rows.append(f"{2*i+1},{name},picture number {i}")
    (data / "captions.csv").write_text("\n".join(rows))

    vocab = tmp_path / "vocab.txt"
    cli.main(["build-vocab", str(data / "captions.csv"), str(vocab),
              "--vocab-size", "64"])
    capsys.readouterr()

    run_dir = tmp_path / "run"
    cli.main([
        "train", "--captions-dir", str(data),
        "--set", f"vocab_file={vocab}",
        "--set", f"image_path={img_dir}",
        "--set", "model_name=vit_s16", "--set", "image_embedding=384",
        "--set", "batch_size=8", "--set", "epochs=1", "--set", "size=32",
        "--set", "max_length=12", "--set", "compute_dtype=float32",
        "--set", "device_data=true", "--set", "device_data_eval=false",
        "--set", "steps_per_call=2",
        "--set", f"checkpoints={run_dir}",
        "--set", f"logdir={tmp_path / 'logs'}",
    ])
    out = capsys.readouterr().out
    assert "0 valid examples" in out          # valid store not staged
    result = json_mod.loads(out.strip().splitlines()[-1])
    assert np.isfinite(result["final_train_loss"])
    assert np.isfinite(result["final_valid_loss"])   # file-loader valid


def test_summarize_convergence_script(tmp_path):
    """examples/summarize_convergence.py: best-epoch/eval/timing summary
    from a Trainer metrics.jsonl."""
    import json as _json
    import subprocess
    import sys

    rows = [
        {"step": 0, "loss/train": 3.0, "loss/val": 2.5,
         "throughput/examples_per_sec_per_chip": 100.0,
         "time/train_s": 3.0, "time/valid_s": 1.0, "time/ckpt_s": 0.1},
        {"step": 1, "loss/train": 2.0, "loss/val": 2.0,
         "throughput/examples_per_sec_per_chip": 9000.0,
         "time/train_s": 2.9, "time/valid_s": 1.1, "time/ckpt_s": 0.1,
         "time/eval_s": 40.0, "eval/recall@1": 0.2, "eval/recall@5": 0.5},
        {"step": 2, "loss/train": 1.9, "loss/val": 2.1,
         "throughput/examples_per_sec_per_chip": 9100.0,
         "time/train_s": 3.1, "time/valid_s": 0.9, "time/ckpt_s": 0.1},
    ]
    p = tmp_path / "metrics.jsonl"
    p.write_text("".join(_json.dumps(r) + "\n" for r in rows))
    out = subprocess.run(
        [sys.executable, "examples/summarize_convergence.py", str(p)],
        capture_output=True, text=True, cwd="/root/repo", check=True)
    s = _json.loads(out.stdout)
    assert s["epochs_run"] == 3
    assert s["best_epoch"] == 1 and s["best_valid_loss"] == 2.0
    assert s["last_eval_epoch"] == 1 and s["eval/recall@5"] == 0.5
    assert s["sustained_pairs_per_s"] == 9050.0
    assert s["time/eval_s_median"] == 40.0
