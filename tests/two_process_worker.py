"""Worker for the two-process jax.distributed proof (not a pytest module).

Launched twice by tests/test_two_process_distributed.py with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set and 4
virtual CPU devices per process: initializes distributed JAX through the
production entry point (parallel.mesh.maybe_initialize_distributed — the
same call `cli train` makes), takes this host's rows via the shard-plan
host partitioning (data/shards.py), assembles the global batch with
``jax.make_array_from_process_local_data``, and runs ONE jitted
global-contrastive train step over the 8-device (2-process) mesh.

Writes {loss, process_count, ...} JSON plus the local batch (npz) for the
parent to check against the single-process oracle.

Usage: python two_process_worker.py <shard_pattern> <vocab> <out_json>
"""

import json
import os
import sys

import numpy as np


def main() -> None:
    shard_pattern, vocab_path, out_json = sys.argv[1:4]

    # Production init path: must run before any backend/device access.
    from mae_clip_tpu.parallel.mesh import (create_mesh,
                                            maybe_initialize_distributed)
    maybe_initialize_distributed()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    pid = jax.process_index()
    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"]), \
        jax.process_count()
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    from mae_clip_tpu.config import Config
    from mae_clip_tpu.data.shards import make_shard_loader
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    from mae_clip_tpu.models.vit import ViTConfig
    from mae_clip_tpu.train.loop import make_train_step
    from mae_clip_tpu.train.optim import make_optimizer
    from mae_clip_tpu.train.state import TrainState

    cfg = Config(model_name="vit_s16", image_embedding=24,
                 projection_dim=16, size=32, max_length=12, batch_size=16,
                 compute_dtype="float32", dropout=0.0,
                 text_trainable=False, global_contrastive=True)
    text_cfg = DistilBertConfig(vocab_size=64, dim=32, n_layers=1,
                                n_heads=4, hidden_dim=64,
                                max_position_embeddings=32)
    vit_cfg = ViTConfig(image_size=32, patch_size=8, dim=24, depth=1,
                        n_heads=3, pos_embed="sincos")
    model = CLIPModel(cfg, text_config=text_cfg, vit_config=vit_cfg)

    # Shard-plan host partitioning: this process streams ONLY its strided
    # subset of shards; both processes compute the identical global plan
    # without communicating (data/shards.py).
    tok = WordPieceTokenizer.from_vocab_file(vocab_path)
    local = next(make_shard_loader(shard_pattern, tok, batch_size=8,
                                   fixed_length=12, size=32,
                                   host_id=pid, num_hosts=2,
                                   seed=0, epoch=0))
    np.savez(out_json + f".batch{pid}.npz", **local)

    # Identical init on every process (same key, same math) -> replicating
    # host values onto the global mesh is consistent.
    example = {k: jnp.asarray(np.concatenate([v, v])) for k, v in
               local.items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    host_params = jax.tree_util.tree_map(np.asarray, variables["params"])

    mesh = create_mesh(8, 1)
    rep = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, rep), host_params)
    tx = make_optimizer(cfg, params)
    state = TrainState.create(params, tx, jax.random.PRNGKey(2))

    data_sh = NamedSharding(mesh, P("data"))
    gbatch = {k: jax.make_array_from_process_local_data(data_sh,
                                                        np.asarray(v))
              for k, v in local.items()}

    step = make_train_step(model, tx, cfg, mesh=mesh)
    state, metrics = step(state, gbatch)
    loss = float(metrics["loss"])           # fully-replicated output

    # GradCache accumulation ACROSS PROCESSES: microbatches scan locally,
    # the cached-embedding contrastive loss all-gathers over the joint
    # mesh — the 32k-recipe path in its true multi-controller form.
    cfg_a = cfg.replace(accum_steps=2)
    params_a = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep),
                                      host_params)
    tx_a = make_optimizer(cfg_a, params_a)
    step_a = make_train_step(model, tx_a, cfg_a, mesh=mesh,
                             accum_steps=cfg_a.accum_steps)
    _, m_a = step_a(TrainState.create(params_a, tx_a,
                                      jax.random.PRNGKey(2)), gbatch)
    loss_accum = float(m_a["loss"])

    # SigLIP ICI ring across processes: the ppermute text rotation rides
    # the joint mesh; loss params (scale/bias) are model-owned.
    cfg_s = cfg.replace(contrastive_loss="siglip")
    model_s = CLIPModel(cfg_s, text_config=text_cfg, vit_config=vit_cfg)
    vars_s = jax.jit(model_s.init)(jax.random.PRNGKey(0), example)
    params_s = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a), rep), vars_s["params"])
    tx_s = make_optimizer(cfg_s, params_s)
    step_s = make_train_step(model_s, tx_s, cfg_s, mesh=mesh)
    _, m_s = step_s(TrainState.create(params_s, tx_s,
                                      jax.random.PRNGKey(2)), gbatch)
    loss_siglip = float(m_s["loss"])

    with open(out_json, "w") as f:
        json.dump({"process": pid,
                   "process_count": jax.process_count(),
                   "global_devices": len(jax.devices()),
                   "loss": loss,
                   "loss_accum": loss_accum,
                   "loss_siglip": loss_siglip}, f)
    print("OK", pid, loss, loss_accum, loss_siglip)


if __name__ == "__main__":
    main()
