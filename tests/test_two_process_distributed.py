"""Two-process jax.distributed proof (SURVEY §2.3 comm backend row).

Spawns TWO real OS processes, each with 4 virtual CPU devices, wired via
``jax.distributed.initialize`` through the production entry point
(``parallel.mesh.maybe_initialize_distributed`` + the JAX_COORDINATOR_*
env contract documented in docs/MULTIHOST.md). Each process loads ONLY
its shard-plan subset of a real tar-shard dataset (data/shards.py),
assembles the global batch with ``jax.make_array_from_process_local_data``
and runs one jitted global-contrastive train step over the joint 8-device
mesh. Asserts:

* both processes report the SAME loss (the collective really ran
  globally), and
* that loss equals the single-process 8-device value on the identical
  global batch — multi-controller execution changes nothing numerically.

This is the executable witness that the multi-host recipe is real, not
documentation. The reference has no distributed layer at all
(reference: config.py:13 single device; no torch.distributed anywhere).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "two_process_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_loss_matches_single_process(tmp_path):
    import cv2

    # --- a real tiny shard dataset: 4 shards x 3 records ---------------
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(9)
    records = []
    captions = []
    words = ["dog", "cat", "red", "ball", "runs", "sits"]
    for i in range(12):
        p = img_dir / f"im{i}.jpg"
        cv2.imwrite(str(p),
                    rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))
        cap = "a photo of " + " ".join(rng.choice(words, size=3))
        records.append((str(p), cap))
        captions.append(cap)

    from mae_clip_tpu.data.shards import write_shards
    shard_dir = tmp_path / "shards"
    paths = write_shards(records, str(shard_dir), shard_size=3)
    assert len(paths) == 4
    pattern = str(shard_dir / "shard-*.tar")

    from mae_clip_tpu.data.tokenizer import build_vocab, save_vocab
    vocab_path = tmp_path / "vocab.txt"
    save_vocab(build_vocab(captions, vocab_size=64), str(vocab_path))

    # --- spawn the two workers -----------------------------------------
    port = _free_port()
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.pop("PYTHONSTARTUP", None)
        # CPU-only workers: do NOT inherit the axon TPU site hook (the
        # lease is exclusive; the proof is about process topology, not
        # the chip) — repo-only PYTHONPATH, platform forced to cpu.
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(i)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, pattern, str(vocab_path), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    results = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
    for i in range(2):
        with open(outs[i]) as f:
            results.append(json.load(f))

    assert results[0]["process_count"] == 2
    assert results[0]["global_devices"] == 8
    # Replicated global losses are identical on both controllers — for
    # the softmax objective, the GradCache-accumulated step, and the
    # SigLIP ICI ring.
    for key in ("loss", "loss_accum", "loss_siglip"):
        assert results[0][key] == results[1][key], key
        assert np.isfinite(results[0][key]), key
    # GradCache exactness holds ACROSS PROCESSES: the accumulated step's
    # loss equals the giant-batch step's (same params/rng, dropout 0).
    np.testing.assert_allclose(results[0]["loss_accum"],
                               results[0]["loss"], rtol=1e-6)

    # --- single-process oracle on the SAME global batch ----------------
    # Reassemble global rows exactly as the 2-process mesh laid them out:
    # process 0's local rows are global rows 0-3 (its devices lead the
    # mesh), process 1's are rows 4-7. The workers dumped their local
    # batches; also check they match this process's own shard-plan
    # streams (cross-process loader determinism).
    from mae_clip_tpu.data.shards import make_shard_loader
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer
    tok = WordPieceTokenizer.from_vocab_file(str(vocab_path))
    local_batches = []
    for host in range(2):
        mine = next(make_shard_loader(pattern, tok, batch_size=8,
                                      fixed_length=12, size=32,
                                      host_id=host, num_hosts=2,
                                      seed=0, epoch=0))
        dumped = dict(np.load(outs[host] + f".batch{host}.npz"))
        for k in mine:
            np.testing.assert_array_equal(mine[k], dumped[k], err_msg=k)
        local_batches.append(mine)
    gbatch = {k: np.concatenate([b[k] for b in local_batches])
              for k in local_batches[0]}

    import jax
    import jax.numpy as jnp
    from mae_clip_tpu.config import Config
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.parallel.mesh import create_mesh
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState

    cfg = Config(model_name="vit_s16", image_embedding=24,
                 projection_dim=16, size=32, max_length=12, batch_size=16,
                 compute_dtype="float32", dropout=0.0,
                 text_trainable=False, global_contrastive=True)
    model = CLIPModel(
        cfg,
        text_config=DistilBertConfig(vocab_size=64, dim=32, n_layers=1,
                                     n_heads=4, hidden_dim=64,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=32, patch_size=8, dim=24, depth=1,
                             n_heads=3, pos_embed="sincos"))
    example = {k: jnp.asarray(np.concatenate([local_batches[0][k]] * 2))
               for k in local_batches[0]}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    tx = make_optimizer(cfg, variables["params"])
    state = TrainState.create(variables["params"], tx, jax.random.PRNGKey(2))
    mesh = create_mesh(8, 1)
    step = make_train_step(model, tx, cfg, mesh=mesh)
    _, metrics = step(state, {k: jnp.asarray(v) for k, v in gbatch.items()})
    single_loss = float(metrics["loss"])

    np.testing.assert_allclose(results[0]["loss"], single_loss,
                               rtol=1e-6, atol=1e-6)

    # SigLIP ring oracle: same init recipe as the workers'.
    cfg_s = cfg.replace(contrastive_loss="siglip")
    model_s = CLIPModel(
        cfg_s,
        text_config=DistilBertConfig(vocab_size=64, dim=32, n_layers=1,
                                     n_heads=4, hidden_dim=64,
                                     max_position_embeddings=32),
        vit_config=ViTConfig(image_size=32, patch_size=8, dim=24, depth=1,
                             n_heads=3, pos_embed="sincos"))
    vars_s = jax.jit(model_s.init)(jax.random.PRNGKey(0), example)
    tx_s = make_optimizer(cfg_s, vars_s["params"])
    step_s = make_train_step(model_s, tx_s, cfg_s, mesh=mesh)
    _, m_s = step_s(
        TrainState.create(vars_s["params"], tx_s, jax.random.PRNGKey(2)),
        {k: jnp.asarray(v) for k, v in gbatch.items()})
    np.testing.assert_allclose(results[0]["loss_siglip"],
                               float(m_s["loss"]), rtol=1e-6, atol=1e-6)
