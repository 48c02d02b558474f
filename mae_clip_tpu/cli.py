"""Command-line entry points.

The reference's only "CLI" is ``python main.py`` with hard-coded paths
(reference: main.py:85-126) plus the standalone converter
``coco_captions_to_df.py``. Here every capability is a subcommand with
config-file + ``key=value`` overrides:

    python -m mae_clip_tpu.cli train --coco-train ann.json --coco-val val.json
    python -m mae_clip_tpu.cli train --captions-dir /data/flickr8k
    python -m mae_clip_tpu.cli retrieve --checkpoint ... --query "a dog"
    python -m mae_clip_tpu.cli zeroshot --checkpoint ... --labels cat,dog
    python -m mae_clip_tpu.cli import-pth checkpoint_3.pth out/
    python -m mae_clip_tpu.cli build-vocab captions.csv vocab.txt
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, List, Optional

from mae_clip_tpu.config import Config


_PRESETS = ("reference_py", "notebook", "flagship_tpu", "flagship_siglip",
            "mae_pretrain", "coco_full", "large_batch_mesh")


def _add_config_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", help="JSON config file")
    p.add_argument("--preset", choices=_PRESETS,
                   help="named config preset (config.py) as the base; "
                        "--config/--set apply on top")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="config override (repeatable)")


def _load_config(args) -> Config:
    if getattr(args, "preset", None):
        import mae_clip_tpu.config as _cfg_mod
        cfg = getattr(_cfg_mod, f"{args.preset}_config")()
        if args.config:
            # Merge ONLY the keys present in the file over the preset.
            def merge(base: dict, over: dict) -> dict:
                for k, v in over.items():
                    if isinstance(v, dict) and isinstance(base.get(k), dict):
                        merge(base[k], v)
                    else:
                        base[k] = v
                return base
            with open(args.config) as f:
                cfg = Config.from_dict(merge(cfg.to_dict(), json.load(f)))
    else:
        cfg = Config.from_file(args.config) if args.config else Config()
    cfg = cfg.with_overrides(args.overrides)
    cfg.validate()
    return cfg


def _with_computed_decay_steps(cfg: Config, n_train: int) -> Config:
    """cosine schedule with decay_steps unset: total steps = epochs x
    ceil(n_train / batch)."""
    if cfg.lr_schedule == "cosine" and not cfg.decay_steps:
        steps_per_epoch = -(-n_train // cfg.batch_size)
        cfg = cfg.replace(decay_steps=cfg.epochs * steps_per_epoch)
    return cfg


def _build_model(cfg: Config, vocab_size: Optional[int] = None):
    from mae_clip_tpu.models.clip import CLIPModel
    from mae_clip_tpu.models.distilbert import DistilBertConfig
    import jax

    del jax  # backend choice happens shape-aware inside the attention op
    text_cfg = DistilBertConfig()
    if vocab_size is not None:
        text_cfg = DistilBertConfig(vocab_size=vocab_size)
    attn = {"always": "pallas", "never": "xla",
            "auto": "auto"}[cfg.use_pallas]
    return CLIPModel(cfg, text_config=text_cfg, attn_impl=attn), text_cfg


def _tokenizer(cfg: Config):
    from mae_clip_tpu.data.tokenizer import WordPieceTokenizer
    if not cfg.vocab_file:
        raise SystemExit(
            "no vocab available: pass --set vocab_file=... (HF-format "
            "vocab.txt; build one offline with the build-vocab subcommand)")
    return WordPieceTokenizer.from_vocab_file(cfg.vocab_file)


def _device_data_setup(cfg: Config, mesh, train_ds, valid_ds,
                       train_tf=None, valid_tf=None, timings=None):
    """Stores + index-loader factories for ``cfg.device_data`` (replicated,
    or row-sharded over the mesh with ``device_data_sharded``). Shared by
    ``cmd_train`` and ``cmd_mae_pretrain``. Train factories are keyed by
    the EPOCH index (Trainer passes it) — a pure function of (seed,
    epoch), so ``--resume`` replays the interrupted epoch's exact shuffle
    and mid-epoch skip_batches lands on the right batches."""
    sharded = cfg.device_data_sharded and mesh is not None
    if sharded:
        from mae_clip_tpu.data.device_store import (
            build_sharded_device_store, make_sharded_index_loader)
        train_store = build_sharded_device_store(
            train_ds, mesh=mesh, text_features=train_tf, timings=timings)
        valid_store = (build_sharded_device_store(
            valid_ds, mesh=mesh, text_features=valid_tf)
            if cfg.device_data_eval else None)
        n_shards = mesh.shape[cfg.mesh.axis_names[0]]

        def train_loader(epoch):
            return make_sharded_index_loader(
                len(train_ds), cfg.batch_size, n_shards, shuffle=True,
                seed=cfg.seed, epoch=cfg.seed + 1 + epoch)

        def valid_loader():
            return make_sharded_index_loader(len(valid_ds),
                                             cfg.batch_size, n_shards)
    else:
        from mae_clip_tpu.data.device_store import (build_device_store,
                                                    make_index_loader)
        train_store = build_device_store(train_ds, text_features=train_tf,
                                         timings=timings)
        valid_store = (build_device_store(valid_ds, text_features=valid_tf)
                       if cfg.device_data_eval else None)

        def train_loader(epoch):
            return make_index_loader(len(train_ds), cfg.batch_size,
                                     shuffle=True,
                                     seed=cfg.seed + 1 + epoch)

        def valid_loader():
            return make_index_loader(len(valid_ds), cfg.batch_size)

    if valid_store is None:
        # device_data_eval=false: validation keeps the standard file
        # loader (the valid store's HBM goes to training instead).
        if hasattr(valid_ds, "captions"):
            from mae_clip_tpu.data.pipeline import make_loader as _ml

            def valid_loader():  # noqa: F811
                return _ml(valid_ds, cfg.batch_size,
                           text_features=valid_tf)
        else:                    # image-only (mae-pretrain) dataset
            from mae_clip_tpu.data.pipeline import (
                make_image_loader as _mil)

            def valid_loader():  # noqa: F811
                return _mil(valid_ds, cfg.batch_size)

    layout = "row-sharded over the mesh" if sharded else "replicated"
    vbytes = valid_store.nbytes if valid_store is not None else 0
    vcount = valid_store.n_real if valid_store is not None else 0
    print(f"device-resident data ({layout}): "
          f"{(train_store.nbytes + vbytes) / 2**20:.0f} MiB "
          f"staged in HBM ({train_store.n_real} train + "
          f"{vcount} valid examples)")
    return train_store, valid_store, train_loader, valid_loader


# ---------------------------------------------------------------------------

def cmd_train(args) -> None:
    import jax
    import numpy as np

    from mae_clip_tpu.data.coco import get_coco_captions_df
    from mae_clip_tpu.data.flickr import make_train_valid_dfs
    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.parallel.mesh import (maybe_initialize_distributed,
                                            mesh_from_config)
    from mae_clip_tpu.train.checkpoint import CheckpointManager
    from mae_clip_tpu.train.loop import Trainer
    from mae_clip_tpu.train.metrics import MetricWriter

    maybe_initialize_distributed()
    cfg = _load_config(args)

    if getattr(args, "shards", None):
        return _train_from_shards(args, cfg)

    # Data: COCO json pair (reference main.py:87-88) or Flickr captions dir
    # (reference main.py:20-31).
    if args.coco_train:
        train_df = get_coco_captions_df(args.coco_train)
        valid_df = get_coco_captions_df(args.coco_val or args.coco_train)
    elif args.captions_dir:
        cfg = cfg.replace(captions_path=args.captions_dir)
        train_df, valid_df = make_train_valid_dfs(args.captions_dir,
                                                  debug=cfg.debug)
    else:
        raise SystemExit("pass --coco-train/--coco-val or --captions-dir")

    tokenizer = _tokenizer(cfg)
    model, text_cfg = _build_model(cfg, vocab_size=tokenizer.vocab_size)

    # ViT towers take the fast path: pre-patchified uint8 shipped to the
    # device, normalization fused into the jitted step (2x step time vs
    # NHWC fp32 on v5e). ResNet keeps NHWC (conv input).
    vit_fast = cfg.model_name.startswith("vit")

    # --augment: decode TRAIN images once at mae.aug_source_size fixed
    # NHWC geometry; a fresh RandomResizedCrop+flip is sampled per step
    # inside the jitted step (train.loop._prep_images — the same
    # device-side path the MAE objective uses). Validation keeps the
    # deterministic fixed-geometry pipeline, so eval/retrieval parity is
    # unaffected. Off by default: the reference trains without any
    # augmentation (dataset.py:44-58, train == valid transforms).
    augment = getattr(args, "augment", False)
    if augment and cfg.mae.aug_source_size == cfg.size:
        raise SystemExit(
            "--augment needs mae.aug_source_size != size (crops need "
            "spare source pixels); set --set mae.aug_source_size=256")

    def make_ds(df, aug=False):
        return CaptionDataset(df["image"].values, df["caption"].values,
                              tokenizer, image_path=cfg.image_path,
                              size=cfg.mae.aug_source_size if aug
                              else cfg.size,
                              max_length=cfg.max_length,
                              raw_uint8=vit_fast or aug,
                              patchify_size=16 if vit_fast and not aug
                              else None,
                              cache=cfg.cache_images)

    train_ds, valid_ds = make_ds(train_df, aug=augment), make_ds(valid_df)
    cfg = _with_computed_decay_steps(cfg, len(train_ds))

    mesh = None
    if len(jax.devices()) > 1:
        mesh = mesh_from_config(cfg.mesh)

    # Multi-host CSV/COCO: every host computes the same seed-deterministic
    # global shuffle and decodes only its contiguous batch_size/num_hosts
    # slice of every global batch (make_loader host slicing); the Trainer
    # assembles the global array per step (parallel.sharding.shard_batch).
    host_id, num_hosts = jax.process_index(), jax.process_count()
    p0 = host_id == 0
    if num_hosts > 1 and cfg.device_data and not cfg.device_data_sharded:
        raise SystemExit(
            "device_data=true under multi-host needs the row-sharded "
            "store: add --set device_data_sharded=true (each process then "
            "decodes/stages only its local rows; the replicated store "
            "assumes one controller — docs/MULTIHOST.md)")

    # One-time setup attribution (VERDICT r3 item 6: the 50-70 min
    # 100k-row setup was one opaque number) — phase seconds, reported as
    # a single `setup_timings` JSON line before training starts.
    import time as _time
    setup: Dict[str, Any] = {}

    rng = np.random.default_rng(cfg.seed)
    example = {k: v for k, v in
               next(make_loader(train_ds, cfg.batch_size, num_threads=1,
                                host_id=host_id, num_hosts=num_hosts)
                    ).items() if k != "caption"}
    if example["image"].dtype == np.uint8:
        # The train step normalizes (and, for aug-source geometry, crops)
        # uint8 on-device; init only needs the post-prep shape/dtype.
        shape = example["image"].shape
        if augment:
            shape = (shape[0], cfg.size, cfg.size, shape[3])
        example = dict(example, image=np.zeros(shape, np.float32))
    _t0 = _time.perf_counter()
    variables = jax.jit(
        lambda r, b: model.init(r, b, mask_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(cfg.seed), example)
    # Value fetch = the only true barrier on the remote-tunnel backend
    # (block_until_ready returns early there; CLAUDE.md / BASELINE.md).
    float(jax.tree_util.tree_leaves(variables)[0].ravel()[0])
    setup["init_s"] = round(_time.perf_counter() - _t0, 3)

    if getattr(args, "init_from_mae", None):
        from mae_clip_tpu.interop.transfer import load_mae_encoder_into_clip
        from mae_clip_tpu.train.checkpoint import load_variables
        mae_vars = load_variables(args.init_from_mae, cfg)
        new_params, transferred, skipped = load_mae_encoder_into_clip(
            variables["params"], mae_vars["params"])
        variables = dict(variables, params=new_params)
        if p0:
            print(f"init-from-mae: {len(transferred)} tensors transferred, "
                  f"{len(skipped)} skipped")

    # LiT-style frozen-text cache: one tower pass per dataset instead of
    # one per step (~1/3 of the flagship step; see config field docs).
    train_tf = valid_tf = None
    if cfg.text_cache_enabled:
        from mae_clip_tpu.train.loop import precompute_text_features
        tv = dict(variables)
        _t0 = _time.perf_counter()
        train_tf = precompute_text_features(model, tv, train_ds)
        valid_tf = precompute_text_features(model, tv, valid_ds)
        setup["text_precompute_s"] = round(_time.perf_counter() - _t0, 3)
        if p0:
            print(f"cached frozen-text features: {train_tf.shape} train, "
                  f"{valid_tf.shape} valid")

    # Device-resident data: whole decoded dataset staged in HBM, batches
    # gathered on device from (B,) index vectors (data.device_store).
    train_store = valid_store = train_loader = valid_loader = None
    if cfg.device_data:
        _t0 = _time.perf_counter()
        (train_store, valid_store, train_loader,
         valid_loader) = _device_data_setup(
            cfg, mesh, train_ds, valid_ds,
            train_tf=train_tf, valid_tf=valid_tf, timings=setup)
        setup["stage_s"] = round(_time.perf_counter() - _t0, 3)
    if p0 and len(setup) > 1:
        print(json.dumps({"setup_timings": setup}))

    mngr = CheckpointManager(cfg.checkpoints)
    step_mngr = None
    if cfg.checkpoint_every_steps > 0:
        from mae_clip_tpu.train.checkpoint import StepCheckpointManager
        import os as _os
        step_mngr = StepCheckpointManager(
            _os.path.join(cfg.checkpoints, "steps"))
    writer = MetricWriter(cfg.logdir) if p0 else None
    trainer = Trainer(cfg, model, variables["params"],
                      batch_stats=variables.get("batch_stats"), mesh=mesh,
                      checkpoint_manager=mngr, writer=writer,
                      progress=getattr(args, "progress", True) and p0,
                      train_store=train_store, valid_store=valid_store,
                      step_checkpoint_manager=step_mngr)

    if train_loader is None:
        def train_loader(epoch):
            return make_loader(train_ds, cfg.batch_size, shuffle=True,
                               seed=cfg.seed + 1 + epoch,
                               text_features=train_tf,
                               host_id=host_id, num_hosts=num_hosts)

        def valid_loader():
            return make_loader(valid_ds, cfg.batch_size,
                               text_features=valid_tf,
                               host_id=host_id, num_hosts=num_hosts)

    eval_fn = None
    if args.eval_retrieval:
        from mae_clip_tpu.eval.retrieval import make_retrieval_eval_fn
        eval_fn = make_retrieval_eval_fn(
            model, valid_ds, lambda d, b: make_loader(d, b),
            batch_size=cfg.batch_size, store=valid_store,
            text_features=valid_tf)

    start_epoch, skip_batches = 0, 0
    if getattr(args, "resume", False):
        # Prefer the NEWER of: the last mid-epoch step checkpoint (its
        # meta epoch is the epoch it was interrupted in) vs the last
        # completed-epoch checkpoint.
        resumed_mid = False
        if step_mngr is not None and step_mngr.latest_step() is not None:
            meta = step_mngr.peek_meta()
            done_epoch = mngr.latest_step()
            if done_epoch is None or meta["epoch"] > done_epoch:
                start_epoch, skip_batches = trainer.restore_mid_epoch()
                resumed_mid = True
        if not resumed_mid and mngr.latest_step() is not None:
            start_epoch = trainer.restore() + 1
        if p0:
            print(f"resumed: epoch {start_epoch}, batch {skip_batches}")

    history = trainer.fit(train_loader, valid_loader, eval_fn=eval_fn,
                          start_epoch=start_epoch,
                          skip_batches=skip_batches)
    mngr.wait()
    if step_mngr is not None:
        step_mngr.wait()
    if p0:
        print(json.dumps({"final_train_loss": history["train_loss"][-1],
                          "final_valid_loss": history["valid_loss"][-1],
                          "best_valid_loss": trainer.best_loss}))


def _train_from_shards(args, cfg: Config) -> None:
    """Streaming training from tar shards (data/shards.py): no global
    index, no whole-dataset tokenization (fixed_length = max_length), no
    frozen-text cache (records stream; there is no dataset-wide id
    table). Local per-host batch = batch_size / process_count."""
    import jax
    import numpy as np

    from mae_clip_tpu.data.shards import (host_batch_counts,
                                          make_shard_loader)
    from mae_clip_tpu.parallel.mesh import mesh_from_config
    from mae_clip_tpu.train.checkpoint import CheckpointManager
    from mae_clip_tpu.train.loop import Trainer
    from mae_clip_tpu.train.metrics import MetricWriter

    tokenizer = _tokenizer(cfg)
    model, _ = _build_model(cfg, vocab_size=tokenizer.vocab_size)
    vit_fast = cfg.model_name.startswith("vit")
    host_id, num_hosts = jax.process_index(), jax.process_count()
    p0 = host_id == 0
    if cfg.batch_size % num_hosts:
        raise SystemExit(f"batch_size {cfg.batch_size} not divisible by "
                         f"{num_hosts} hosts")
    local_bs = cfg.batch_size // num_hosts

    def loader(pattern, epoch):
        # Hosts stream disjoint shard subsets whose record counts differ;
        # every host pads its stream to the max per-host batch count so
        # the mesh collectives stay in lockstep (host_batch_counts is
        # deterministic — no coordination needed).
        pad = (max(host_batch_counts(pattern, local_bs, num_hosts,
                                     seed=cfg.seed, epoch=epoch))
               if num_hosts > 1 else None)
        return make_shard_loader(
            pattern, tokenizer, local_bs, fixed_length=cfg.max_length,
            size=cfg.size, patchify_size=16 if vit_fast else None,
            raw_uint8=vit_fast, host_id=host_id, num_hosts=num_hosts,
            seed=cfg.seed, epoch=epoch, pad_to_batches=pad)

    mesh = None
    if len(jax.devices()) > 1:
        mesh = mesh_from_config(cfg.mesh)

    example = next(loader(args.shards, 0))
    if example["image"].dtype == np.uint8:
        example = dict(example, image=np.zeros(example["image"].shape,
                                               np.float32))
    variables = jax.jit(
        lambda r, b: model.init(r, b, mask_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(cfg.seed), example)

    mngr = CheckpointManager(cfg.checkpoints)
    writer = MetricWriter(cfg.logdir) if p0 else None
    trainer = Trainer(cfg, model, variables["params"], mesh=mesh,
                      checkpoint_manager=mngr, writer=writer,
                      progress=getattr(args, "progress", True) and p0)

    start_epoch = 0
    if getattr(args, "resume", False) and mngr.latest_step() is not None:
        start_epoch = trainer.restore() + 1
        if p0:
            print(f"resumed: epoch {start_epoch}, batch 0")

    history = trainer.fit(
        lambda epoch=0: loader(args.shards, epoch),
        lambda epoch=0: loader(args.shards_val or args.shards, 0),
        start_epoch=start_epoch)
    mngr.wait()
    if p0:
        print(json.dumps({"final_train_loss": history["train_loss"][-1],
                          "final_valid_loss": history["valid_loss"][-1],
                          "best_valid_loss": trainer.best_loss}))


def cmd_retrieve(args) -> None:
    import jax
    import numpy as np

    from mae_clip_tpu.data.coco import get_coco_captions_df
    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.eval.retrieval import (compute_image_embeddings,
                                             find_matches)
    from mae_clip_tpu.train.checkpoint import load_variables

    cfg = _load_config(args)
    tokenizer = _tokenizer(cfg)
    model, _ = _build_model(cfg, vocab_size=tokenizer.vocab_size)
    variables = load_variables(args.checkpoint, cfg)

    df = get_coco_captions_df(args.coco_val)
    ds = CaptionDataset(df["image"].values, df["caption"].values, tokenizer,
                        image_path=cfg.image_path, size=cfg.size,
                        max_length=cfg.max_length)
    gallery = compute_image_embeddings(
        model, variables, make_loader(ds, cfg.batch_size))
    matches = find_matches(model, variables, gallery, args.query,
                           list(df["image"].values), tokenizer, n=args.n)
    print(json.dumps({"query": args.query, "matches": matches}))


def cmd_eval(args) -> None:
    """Bidirectional retrieval recall@K over a captions dataset (the
    reference has no batch eval at all — its retrieval is one query at a
    time, inference.py:29-47)."""
    from mae_clip_tpu.data.coco import get_coco_captions_df
    from mae_clip_tpu.data.flickr import make_train_valid_dfs
    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.eval.retrieval import evaluate_retrieval
    from mae_clip_tpu.train.checkpoint import load_variables

    cfg = _load_config(args)
    # The linear probe needs no text path; only build the tokenizer for
    # the text-dependent evals.
    needs_text = bool(args.zeroshot_dir or args.coco_val
                      or args.captions_dir)
    tokenizer = _tokenizer(cfg) if needs_text else None
    model, _ = _build_model(
        cfg, vocab_size=tokenizer.vocab_size if tokenizer else None)
    variables = load_variables(args.checkpoint, cfg)

    metrics = {}
    if getattr(args, "linear_probe_dir", None):
        from mae_clip_tpu.eval.linear_probe import linear_probe_dir_eval
        metrics.update(linear_probe_dir_eval(
            model, variables, args.linear_probe_dir, size=cfg.size,
            batch_size=cfg.batch_size))
    if args.zeroshot_dir:
        from mae_clip_tpu.eval.zeroshot import zero_shot_dir_eval
        zs = zero_shot_dir_eval(
            model, variables, tokenizer, args.zeroshot_dir, size=cfg.size,
            batch_size=cfg.batch_size, template=args.template)
        metrics.update({f"zeroshot_{k}": v for k, v in zs.items()})
    if args.coco_val or args.captions_dir:
        if args.coco_val:
            df = get_coco_captions_df(args.coco_val)
        else:
            _, df = make_train_valid_dfs(args.captions_dir, debug=cfg.debug)
        ds = CaptionDataset(df["image"].values, df["caption"].values,
                            tokenizer, image_path=cfg.image_path,
                            size=cfg.size, max_length=cfg.max_length)
        metrics.update(evaluate_retrieval(
            model, variables, ds, lambda d, b: make_loader(d, b),
            batch_size=cfg.batch_size, max_samples=args.max_samples))
    if not metrics:
        raise SystemExit("pass --coco-val, --captions-dir, "
                         "--zeroshot-dir, or --linear-probe-dir")
    print(json.dumps(metrics))


def cmd_zeroshot(args) -> None:
    import jax.numpy as jnp
    import numpy as np

    from mae_clip_tpu.data.images import decode_image, host_preprocess
    from mae_clip_tpu.eval.zeroshot import (build_zero_shot_classifier,
                                            siglip_zero_shot_probs,
                                            zero_shot_probs)
    from mae_clip_tpu.train.checkpoint import load_variables

    cfg = _load_config(args)
    tokenizer = _tokenizer(cfg)
    model, _ = _build_model(cfg, vocab_size=tokenizer.vocab_size)
    variables = load_variables(args.checkpoint, cfg)

    labels = args.labels.split(",")
    classifier = build_zero_shot_classifier(model, variables, tokenizer,
                                            labels, template=args.template)
    img = host_preprocess(decode_image(args.image), cfg.size)[None]
    feats = model.apply(variables, jnp.asarray(img),
                        method=model.encode_image)
    emb = model.apply(variables, feats, method=model.project_image)
    params = variables["params"]
    if cfg.contrastive_loss == "siglip" and "logit_scale" in params:
        # SigLIP checkpoints score with their trained scale/bias: calibrated
        # per-label sigmoid probabilities (same ranking as the softmax
        # protocol, reference CIFAR.ipynb cell 9, which remains the default).
        probs = np.asarray(siglip_zero_shot_probs(
            emb, classifier, params["logit_scale"],
            params["logit_bias"]))[0]
    elif cfg.contrastive_loss == "clip" and "logit_scale" in params:
        # The CLIP-paper objective evaluates with its TRAINED scale
        # (arXiv:2103.00020 §2.5; exp(s) clamped at 100 == the protocol's
        # fixed 100 once training saturates the clamp).
        scale = float(np.minimum(np.exp(params["logit_scale"]), 100.0))
        probs = np.asarray(zero_shot_probs(emb, classifier, scale))[0]
    else:
        probs = np.asarray(zero_shot_probs(emb, classifier))[0]
    order = np.argsort(-probs)
    print(json.dumps({labels[i]: float(probs[i]) for i in order}))


def cmd_import_pth(args) -> None:
    import jax

    from mae_clip_tpu.train.checkpoint import import_reference_checkpoint
    import orbax.checkpoint as ocp

    cfg = _load_config(args)
    variables = import_reference_checkpoint(args.pth, cfg)
    ckptr = ocp.StandardCheckpointer()
    import os
    ckptr.save(os.path.abspath(args.out), variables)
    ckptr.wait_until_finished()
    n = len(jax.tree_util.tree_leaves(variables))
    print(json.dumps({"imported_arrays": n, "out": args.out}))


def cmd_serve(args) -> None:
    """Serve embedding/retrieval/zero-shot over HTTP from any checkpoint
    form (.pth / Trainer run dir / import-pth output) + COCO gallery."""
    import jax.numpy as jnp

    from mae_clip_tpu.data.coco import get_coco_captions_df
    from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
    from mae_clip_tpu.eval.retrieval import compute_image_embeddings
    from mae_clip_tpu.serve import RetrievalService, make_server
    from mae_clip_tpu.train.checkpoint import load_variables

    cfg = _load_config(args)
    tokenizer = _tokenizer(cfg)
    model, _ = _build_model(cfg, vocab_size=tokenizer.vocab_size)
    variables = load_variables(args.checkpoint, cfg)

    gallery = None
    names = []
    if args.coco_val:
        df = get_coco_captions_df(args.coco_val)
        ds = CaptionDataset(df["image"].values, df["caption"].values,
                            tokenizer, image_path=cfg.image_path,
                            size=cfg.size, max_length=cfg.max_length)
        gallery = compute_image_embeddings(
            model, variables, make_loader(ds, cfg.batch_size))
        names = list(df["image"].values)

    svc = RetrievalService(model, variables, tokenizer, gallery=gallery,
                           gallery_names=names, max_length=cfg.max_length,
                           dedup_stride=5 if names else 1,
                           quantize_gallery=args.quantize_gallery)
    if args.microbatch > 1 and gallery is not None:
        svc.enable_micro_batching(max_batch=args.microbatch,
                                  max_wait_ms=args.microbatch_wait_ms,
                                  max_queue=args.max_queue or None,
                                  deadline_ms=args.deadline_ms or None)
    server = make_server(svc, host=args.host, port=args.port)
    print(json.dumps({"serving": f"http://{args.host}:"
                                 f"{server.server_address[1]}",
                      "gallery_size": 0 if gallery is None
                      else int(gallery.shape[0])}))
    server.serve_forever()


def cmd_data_coco(args) -> None:
    """COCO captions JSON -> (image, caption) CSV.

    The reference ships this as a standalone argparse CLI whose result is
    discarded (reference: coco_captions_to_df.py:32-39, the --output write
    is commented out); here --out actually writes a captions.csv usable by
    the train subcommand and the Flickr-style loaders."""
    from mae_clip_tpu.data.coco import coco_captions_records

    records = coco_captions_records(args.json)
    if args.limit:
        records = records[:args.limit]
    if args.out:
        import csv
        with open(args.out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["image", "caption"])
            w.writerows(records)
    print(json.dumps({"rows": len(records),
                      "images": len({r[0] for r in records}),
                      "out": args.out or None}))


def cmd_build_vocab(args) -> None:
    from mae_clip_tpu.data.tokenizer import build_vocab, save_vocab

    texts: List[str] = []
    if args.captions.endswith(".json"):
        from mae_clip_tpu.data.coco import coco_captions_records
        texts = [c for _, c in coco_captions_records(args.captions)]
    else:
        import pandas as pd
        texts = pd.read_csv(args.captions)["caption"].astype(str).tolist()
    vocab = build_vocab(texts, vocab_size=args.vocab_size)
    save_vocab(vocab, args.out)
    print(json.dumps({"vocab_size": len(vocab), "out": args.out}))


def cmd_mae_pretrain(args) -> None:
    """Image-only MAE pretraining (He et al., arXiv:2111.06377) — the
    capability the reference repo names ('Training CLIP with MAE',
    reference README.md:2) but never ships. The pretrained encoder
    transfers into a CLIP run via ``train --init-from-mae <run_dir>``."""
    import dataclasses

    import jax
    import numpy as np

    from mae_clip_tpu.data.pipeline import ImageDataset, make_image_loader
    from mae_clip_tpu.models.clip import mae_vit_for
    from mae_clip_tpu.parallel.mesh import (maybe_initialize_distributed,
                                            mesh_from_config)
    from mae_clip_tpu.train.checkpoint import CheckpointManager
    from mae_clip_tpu.train.loop import Trainer
    from mae_clip_tpu.train.metrics import MetricWriter

    maybe_initialize_distributed()
    cfg = _load_config(args)
    if not cfg.mae.enabled:
        cfg = cfg.replace(mae=dataclasses.replace(cfg.mae, enabled=True))
    if not cfg.model_name.startswith("vit"):
        cfg = cfg.replace(model_name="vit_s16", image_embedding=384)
    cfg.validate()

    attn = {"always": "pallas", "never": "xla", "auto": "auto"}[cfg.use_pallas]
    model = mae_vit_for(cfg, attn_impl=attn)
    patch = model.config.patch_size

    # Input geometry. Host mode (the torchvision-faithful path) ships
    # cfg.size patchified uint8 and crops on the host per epoch. Device
    # mode (ops/augment.py) decodes ONCE at mae.aug_source_size fixed
    # geometry — cacheable (cache_images) and HBM-stageable (device_data)
    # — and samples RandomResizedCrop+flip inside the jitted step, which
    # removes the per-epoch host decode (~75-150 img/s on one core) from
    # the input path. --no-augment keeps fixed geometry either way.
    device_aug = args.augment and (cfg.device_data
                                   or args.augment_mode == "device")
    if device_aug and cfg.mae.aug_source_size == cfg.size:
        # The jitted step dispatches on geometry (source != cfg.size);
        # equal sizes would silently skip the crop+flip entirely.
        raise SystemExit(
            f"device augmentation needs mae.aug_source_size != size "
            f"(both are {cfg.size}): the raw source must be larger than "
            f"the crop so the in-step RandomResizedCrop has room to "
            f"sample (and so the step can tell sources from "
            f"preprocessed batches). Set --set mae.aug_source_size="
            f"{max(cfg.size + cfg.size // 8, cfg.size + 16)} or use "
            f"--augment-mode host.")
    if device_aug:
        src_size, src_patch = cfg.mae.aug_source_size, None
    else:
        src_size, src_patch = cfg.size, patch

    dataset = ImageDataset.from_directory(
        args.images, size=src_size, raw_uint8=True, patchify_size=src_patch,
        cache=cfg.cache_images and not (args.augment and not device_aug))
    # Seeded holdout split for the best-val checkpoint policy.
    n = len(dataset)
    order = np.random.default_rng(cfg.seed).permutation(n)
    n_val = max(1, int(n * args.val_fraction)) if n > 1 else 0
    files = np.asarray(dataset.image_filenames)
    mk = lambda idx: ImageDataset(files[idx].tolist(), size=src_size,
                                  raw_uint8=True, patchify_size=src_patch,
                                  cache=dataset._img_cache is not None)
    train_ds = mk(order[n_val:]) if n_val else dataset
    valid_ds = mk(order[:n_val]) if n_val else dataset
    cfg = _with_computed_decay_steps(cfg, len(train_ds))

    mesh = None
    if len(jax.devices()) > 1:
        mesh = mesh_from_config(cfg.mesh)

    if device_aug:
        init_img = np.zeros((cfg.batch_size, src_size, src_size, 3),
                            np.uint8)
    else:
        example = next(make_image_loader(train_ds, cfg.batch_size,
                                         num_threads=1))
        init_img = np.zeros(example["image"].shape, np.float32)
    variables = jax.jit(
        lambda r, b: model.init(r, b, jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(cfg.seed), init_img)

    train_store = valid_store = train_loader = valid_loader = None
    if cfg.device_data:
        (train_store, valid_store, train_loader,
         valid_loader) = _device_data_setup(cfg, mesh, train_ds, valid_ds)

    mngr = CheckpointManager(cfg.checkpoints)
    step_mngr = None
    if cfg.checkpoint_every_steps > 0:
        from mae_clip_tpu.train.checkpoint import StepCheckpointManager
        import os as _os
        step_mngr = StepCheckpointManager(
            _os.path.join(cfg.checkpoints, "steps"))
    writer = MetricWriter(cfg.logdir)
    trainer = Trainer(cfg, model, variables["params"], mesh=mesh,
                      checkpoint_manager=mngr, writer=writer,
                      progress=getattr(args, "progress", True),
                      objective="mae",
                      train_store=train_store, valid_store=valid_store,
                      step_checkpoint_manager=step_mngr)

    if train_loader is None:
        def train_loader(epoch):
            return make_image_loader(train_ds, cfg.batch_size, shuffle=True,
                                     seed=cfg.seed + 1 + epoch,
                                     augment=args.augment and not device_aug)

        def valid_loader():
            return make_image_loader(valid_ds, cfg.batch_size)

    start_epoch, skip_batches = 0, 0
    if getattr(args, "resume", False):
        resumed_mid = False
        if step_mngr is not None and step_mngr.latest_step() is not None:
            meta = step_mngr.peek_meta()
            done_epoch = mngr.latest_step()
            if done_epoch is None or meta["epoch"] > done_epoch:
                start_epoch, skip_batches = trainer.restore_mid_epoch()
                resumed_mid = True
        if not resumed_mid and mngr.latest_step() is not None:
            start_epoch = trainer.restore() + 1
        print(f"resumed: epoch {start_epoch}, batch {skip_batches}")

    history = trainer.fit(train_loader, valid_loader,
                          start_epoch=start_epoch,
                          skip_batches=skip_batches)
    mngr.wait()
    if step_mngr is not None:
        step_mngr.wait()
    print(json.dumps({"final_train_loss": history["train_loss"][-1],
                      "final_valid_loss": history["valid_loss"][-1],
                      "best_valid_loss": trainer.best_loss}))


def cmd_reconstruct(args) -> None:
    """MAE reconstruction grid (paper Fig. 2): original | masked |
    reconstructed, from a mae-pretrain run or a MAE-enabled CLIP
    checkpoint."""
    import dataclasses
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mae_clip_tpu.data.images import decode_image, host_preprocess
    from mae_clip_tpu.eval.reconstruct import (mae_reconstructions,
                                               save_reconstruction_grid)
    from mae_clip_tpu.models.clip import mae_vit_for
    from mae_clip_tpu.train.checkpoint import load_variables

    cfg = _load_config(args)
    if not cfg.mae.enabled:
        cfg = cfg.replace(mae=dataclasses.replace(cfg.mae, enabled=True))
    if not cfg.model_name.startswith("vit"):
        # Do NOT silently rewrite: the model geometry must match the
        # checkpoint or flax restore fails with an opaque error later.
        raise SystemExit(
            f"reconstruct needs a ViT+MAE checkpoint; config has "
            f"model_name={cfg.model_name!r} (pass --set model_name=vit_s16 "
            f"etc. to match the checkpoint)")

    model = mae_vit_for(cfg, attn_impl="xla")
    params = load_variables(args.checkpoint, cfg)["params"]
    if "image_encoder" in params:     # CLIP checkpoint: the tower subtree
        params = params["image_encoder"]

    if os.path.isdir(args.images):
        from mae_clip_tpu.data.pipeline import ImageDataset
        paths = ImageDataset.from_directory(args.images).image_filenames
    else:
        paths = args.images.split(",")
    paths = paths[:args.n]
    imgs = jnp.asarray(np.stack(
        [host_preprocess(decode_image(p), cfg.size) for p in paths]))

    out = mae_reconstructions(model, {"params": params}, imgs,
                              jax.random.PRNGKey(args.seed),
                              norm_pix=cfg.mae.norm_pix_loss)
    save_reconstruction_grid(out, args.out, max_rows=args.n)
    print(json.dumps({"out": args.out, "images": len(paths)}))


def cmd_data_shards(args) -> None:
    """Pack a captions dataset into webdataset-style tar shards
    (data/shards.py) for streaming multi-host training."""
    import os

    from mae_clip_tpu.data.shards import write_shards

    if args.coco:
        from mae_clip_tpu.data.coco import get_coco_captions_df
        df = get_coco_captions_df(args.coco)
    elif args.captions_dir:
        import pandas as pd
        df = pd.read_csv(os.path.join(args.captions_dir, "captions.csv"))
    else:
        raise SystemExit("pass --coco or --captions-dir")
    image_path = args.image_path or ""
    records = [(os.path.join(image_path, img) if image_path else img, cap)
               for img, cap in zip(df["image"], df["caption"])]
    paths = write_shards(records, args.out, shard_size=args.shard_size)
    print(json.dumps({"shards": len(paths), "records": len(records),
                      "out": args.out}))


def cmd_export_pth(args) -> None:
    """Export a checkpoint to a torch ``.pth`` state_dict:
    * reference-layout CLIP composite (default) — loads into the
      reference's ``model.load_state_dict`` (reference inference.py:18);
    * ``--timm-vit`` — the (MAE-pretrained or CLIP) ViT image encoder as a
      timm VisionTransformer state_dict."""
    from mae_clip_tpu.interop.torch_export import (export_clip_state_dict,
                                                   export_mae_encoder_to_timm,
                                                   save_pth)
    from mae_clip_tpu.train.checkpoint import load_variables

    cfg = _load_config(args)
    variables = load_variables(args.checkpoint, cfg)

    if args.timm_vit:
        params = variables["params"]
        if "image_encoder" in params:     # CLIP ckpt: the tower subtree
            params = params["image_encoder"]
        if "patch_embed" not in params:
            raise SystemExit("--timm-vit needs a ViT/MAE image tower")
        import numpy as np
        rows = np.asarray(params["patch_embed"]["proj"]["kernel"]).shape[0]
        patch = int(round((rows // 3) ** 0.5))
        sd = export_mae_encoder_to_timm(params, grid_size=cfg.size // patch)
    else:
        patch = 16 if cfg.model_name.startswith("vit") else 0
        sd = export_clip_state_dict(variables, model_name=cfg.model_name,
                                    grid_size=(cfg.size // patch
                                               if patch else 0))
    save_pth(sd, args.out)
    print(json.dumps({"out": args.out, "tensors": len(sd)}))


def cmd_embed(args) -> None:
    """Bulk embedding export to ``.npz`` (new capability; the reference
    embeds one query at a time, inference.py:29-47): encode a directory
    of images and/or a file of texts (one per line) into L2-normalized
    projection-space arrays for offline indexing / ANN ingestion."""
    import os

    import numpy as np

    from mae_clip_tpu.train.checkpoint import load_variables

    cfg = _load_config(args)
    if args.shards and (args.images or args.texts):
        raise SystemExit("--shards embeds its own records; don't combine "
                         "with --images/--texts")
    if not (args.images or args.texts or args.shards):
        raise SystemExit("pass --images DIR, --texts FILE, or "
                         "--shards PATTERN")
    tokenizer = _tokenizer(cfg) if (args.texts or args.shards) else None
    model, _ = _build_model(
        cfg, vocab_size=tokenizer.vocab_size if tokenizer else None)
    variables = load_variables(args.checkpoint, cfg)

    from mae_clip_tpu.ops.retrieval import l2_normalize
    out, report = {}, {"output": args.output}
    if args.shards:
        # Web-scale gallery export: stream tar shards (data/shards.py),
        # embed BOTH sides of every record, keep the keys for alignment.
        import glob as _glob

        import jax.numpy as jnp

        from mae_clip_tpu.data.images import (decode_image_bytes,
                                              host_preprocess)
        from mae_clip_tpu.data.shards import iter_shard_records
        from mae_clip_tpu.eval.retrieval import (_image_embed_fn,
                                                 compute_text_embeddings)

        shards = sorted(_glob.glob(args.shards))
        if not shards:
            raise SystemExit(f"no shards match {args.shards!r}")
        embed_img = _image_embed_fn(model)
        bs = cfg.batch_size
        keys, captions, chunks, buf = [], [], [], []

        def flush():
            if not buf:
                return
            count = len(buf)
            imgs = np.stack(buf + [np.zeros_like(buf[0])] * (bs - count))
            chunks.append(np.asarray(
                embed_img(variables, jnp.asarray(imgs)))[:count])
            buf.clear()

        for sp in shards:
            for k, img_bytes, caption in iter_shard_records(sp):
                keys.append(k)
                captions.append(caption)
                buf.append(host_preprocess(decode_image_bytes(img_bytes),
                                           cfg.size))
                if len(buf) == bs:
                    flush()
        flush()
        if not keys:
            raise SystemExit(
                f"no (image, caption) records found in {args.shards!r} "
                f"({len(shards)} shard file(s) matched — are the member "
                f"extensions .jpg/.png + .txt?)")
        out["image_embeddings"] = np.asarray(
            l2_normalize(jnp.asarray(np.concatenate(chunks))))
        enc = tokenizer.encode_batch(captions, max_length=cfg.max_length,
                                     fixed_length=cfg.max_length)
        out["text_embeddings"] = np.asarray(l2_normalize(jnp.asarray(
            compute_text_embeddings(
                model, variables, np.asarray(enc["input_ids"], np.int32),
                np.asarray(enc["attention_mask"], np.int32), bs))))
        out["keys"] = np.asarray(keys)
        out["texts"] = np.asarray(captions)
        report["records"] = len(keys)
    if args.images:
        from mae_clip_tpu.eval.retrieval import compute_image_embeddings
        from mae_clip_tpu.eval.zeroshot import image_label_loader
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        paths = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if f.lower().endswith(exts))
        if not paths:
            raise SystemExit(f"no images under {args.images}")
        emb = compute_image_embeddings(
            model, variables,
            image_label_loader(paths, [0] * len(paths), cfg.size,
                               cfg.batch_size))
        out["image_embeddings"] = np.asarray(l2_normalize(emb))
        out["image_files"] = np.asarray(
            [os.path.basename(p) for p in paths])
        report["images"] = len(paths)
    if args.texts:
        import jax.numpy as jnp

        from mae_clip_tpu.eval.retrieval import compute_text_embeddings
        with open(args.texts) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
        if not texts:
            raise SystemExit(f"no non-empty lines in {args.texts}")
        # fixed_length pins one static width -> one compiled executable
        # across all chunks (the tail chunk adds a second shape).
        enc = tokenizer.encode_batch(texts, max_length=cfg.max_length,
                                     fixed_length=cfg.max_length)
        emb = compute_text_embeddings(
            model, variables,
            np.asarray(enc["input_ids"], np.int32),
            np.asarray(enc["attention_mask"], np.int32), cfg.batch_size)
        out["text_embeddings"] = np.asarray(l2_normalize(jnp.asarray(emb)))
        out["texts"] = np.asarray(texts)
        report["texts"] = len(texts)
    np.savez(args.output, **out)
    report["dim"] = int(next(
        v.shape[-1] for k, v in out.items() if k.endswith("embeddings")))
    print(json.dumps(report))


# ---------------------------------------------------------------------------

def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(prog="mae_clip_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train CLIP(+MAE) on captions data")
    _add_config_args(p)
    p.add_argument("--coco-train")
    p.add_argument("--coco-val")
    p.add_argument("--captions-dir")
    p.add_argument("--resume", action="store_true",
                   help="resume from the checkpoints dir: the newest "
                        "mid-epoch step checkpoint (checkpoint_every_steps"
                        " > 0) or the last completed epoch")
    p.add_argument("--augment", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="per-step device-side RandomResizedCrop+flip for "
                        "TRAIN images (decoded once at mae.aug_source_size;"
                        " validation stays deterministic). The reference "
                        "trains without augmentation (its default here).")
    p.add_argument("--eval-retrieval", action="store_true",
                   help="compute recall@K on the validation split per epoch")
    p.add_argument("--progress", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="tqdm progress bars; --no-progress also lets the "
                        "Trainer batch its device->host loss fetches "
                        "(metric_fetch_every) instead of syncing per step")
    p.add_argument("--init-from-mae",
                   help="initialize the image tower from a mae-pretrain "
                        "run directory (MAE-paper transfer recipe)")
    p.add_argument("--shards",
                   help="tar-shard glob (data-shards output) — streaming "
                        "multi-host input instead of CSV/COCO")
    p.add_argument("--shards-val", help="validation shard glob")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("mae-pretrain",
                       help="image-only MAE pretraining (masked "
                            "reconstruction, no captions)")
    _add_config_args(p)
    p.add_argument("--images", required=True,
                   help="directory tree of images")
    p.add_argument("--val-fraction", type=float, default=0.05)
    p.add_argument("--resume", action="store_true",
                   help="resume from the checkpoints dir (newest mid-epoch "
                        "step checkpoint or last completed epoch)")
    p.add_argument("--augment", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="RandomResizedCrop+flip (MAE-paper augmentation)")
    p.add_argument("--augment-mode", choices=("host", "device"),
                   default="host",
                   help="host: torchvision-faithful per-epoch host crops; "
                        "device: decode once at mae.aug_source_size, crop "
                        "inside the jitted step (ops/augment.py — removes "
                        "the host decode bottleneck; implied by "
                        "device_data=true)")
    p.add_argument("--progress", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="tqdm progress bars; --no-progress also lets the "
                        "Trainer batch its device->host loss fetches")
    p.set_defaults(fn=cmd_mae_pretrain)

    p = sub.add_parser("retrieve", help="text->image retrieval")
    _add_config_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--coco-val", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("-n", type=int, default=9)
    p.set_defaults(fn=cmd_retrieve)

    p = sub.add_parser("eval", help="retrieval recall@K (t2i and i2t) "
                                    "and/or zero-shot accuracy")
    _add_config_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--coco-val")
    p.add_argument("--captions-dir")
    p.add_argument("--zeroshot-dir",
                   help="class-per-subdirectory image tree")
    p.add_argument("--linear-probe-dir",
                   help="class-per-subdirectory tree: linear probe on "
                        "frozen encoder features (MAE-paper protocol)")
    p.add_argument("--template", default=["a photo of a {}"],
                   nargs="+",
                   help="one or more prompt templates; multiple = "
                        "CLIP-paper prompt ensembling (normalized "
                        "per-template embeddings averaged per class)")
    p.add_argument("--max-samples", type=int, default=None)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("zeroshot", help="zero-shot label probe on one image")
    _add_config_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--labels", required=True, help="comma-separated")
    p.add_argument("--template", default=["a photo of a {}"],
                   nargs="+",
                   help="one or more prompt templates (ensembling)")
    p.set_defaults(fn=cmd_zeroshot)

    p = sub.add_parser("reconstruct",
                       help="MAE reconstruction grid (original | masked | "
                            "reconstructed)")
    _add_config_args(p)
    p.add_argument("--checkpoint", required=True,
                   help="mae-pretrain run dir or MAE-enabled CLIP ckpt")
    p.add_argument("--images", required=True,
                   help="image directory or comma-separated files")
    p.add_argument("--out", default="reconstructions.png")
    p.add_argument("-n", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_reconstruct)

    p = sub.add_parser("import-pth",
                       help="convert a reference .pth checkpoint")
    _add_config_args(p)
    p.add_argument("pth")
    p.add_argument("out")
    p.set_defaults(fn=cmd_import_pth)

    p = sub.add_parser("data-shards",
                       help="pack captions data into webdataset-style "
                            "tar shards for streaming training")
    p.add_argument("--coco", help="COCO captions annotation JSON")
    p.add_argument("--captions-dir", help="dir containing captions.csv")
    p.add_argument("--image-path", help="prefix for image paths")
    p.add_argument("--shard-size", type=int, default=1000)
    p.add_argument("out")
    p.set_defaults(fn=cmd_data_shards)

    p = sub.add_parser("export-pth",
                       help="export a checkpoint to a torch .pth "
                            "(reference CLIP layout, or --timm-vit)")
    _add_config_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("out")
    p.add_argument("--timm-vit", action="store_true",
                   help="export the ViT image encoder as a timm "
                        "VisionTransformer state_dict")
    p.set_defaults(fn=cmd_export_pth)

    p = sub.add_parser("embed",
                       help="bulk-export L2-normalized embeddings to .npz "
                            "(images dir and/or texts file)")
    _add_config_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--images", help="directory of images to encode")
    p.add_argument("--texts", help="text file, one caption per line")
    p.add_argument("--shards",
                   help="tar-shard glob (data-shards output): embed every "
                        "record's image AND caption, keyed")
    p.add_argument("--output", required=True, help=".npz output path")
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("serve", help="HTTP embedding/retrieval server")
    _add_config_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--coco-val", help="build the retrieval gallery")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--quantize-gallery", action="store_true",
                   help="hold the gallery int8 at rest (4x less memory; "
                        "per-row symmetric quantization of normalized "
                        "embeddings, chunks dequantized in the top-k scan)")
    p.add_argument("--microbatch", type=int, default=16,
                   help="coalesce up to N concurrent /retrieve requests "
                        "into one jitted call (1 disables)")
    p.add_argument("--microbatch-wait-ms", type=float, default=5.0)
    p.add_argument("--max-queue", type=int, default=128,
                   help="cap on waiting /retrieve requests; beyond it the "
                        "server sheds with HTTP 503 (bounds tail latency "
                        "for admitted requests; 0 = unbounded)")
    p.add_argument("--deadline-ms", type=float, default=0,
                   help="shed queued requests older than this before they "
                        "cost a device call (503; 0 = off)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("build-vocab",
                       help="build a WordPiece vocab from captions")
    p.add_argument("captions", help="COCO json or captions.csv")
    p.add_argument("out")
    p.add_argument("--vocab-size", type=int, default=8192)
    p.set_defaults(fn=cmd_build_vocab)

    p = sub.add_parser("data-coco",
                       help="COCO captions JSON -> (image, caption) CSV "
                            "(reference coco_captions_to_df.py CLI)")
    p.add_argument("json", help="COCO captions annotation JSON")
    p.add_argument("--out", help="write captions.csv here")
    p.add_argument("--limit", type=int, default=0,
                   help="keep first N rows (reference test fixture "
                        "semantics, coco_captions_to_df.py:28-30)")
    p.set_defaults(fn=cmd_data_coco)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
