"""Jitted train/eval steps and the epoch-level Trainer.

TPU-first equivalent of the reference driver (reference: main.py:51-126):
one ``jax.jit``-compiled train step (forward + backward + AdamW update)
with donated state, batches sharded over the mesh ``data`` axis, and the
global-batch contrastive loss computed under ``shard_map`` with explicit
``all_gather``/``psum`` so the effective contrastive batch is the GLOBAL
batch (the reference's loss is per-local-batch B x B, CLIP.py:34).

Epoch semantics mirror the reference:
* count-weighted loss meters over possibly-ragged batches (main.py:63-64);
* eval under no-grad with dropout off / BN frozen (main.py:114-116);
* best-validation checkpointing (main.py:118-122);
* ``ReduceLROnPlateau`` stepping per ``cfg.scheduler_step`` — including the
  reference's faithful "epoch mode never actually steps" quirk when
  ``recipe='py'`` (see train/optim.py docstring).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mae_clip_tpu.config import Config
from mae_clip_tpu.ops import losses as losses_lib
from mae_clip_tpu.parallel.sharding import (batch_sharding,
                                            opt_state_shardings,
                                            param_shardings,
                                            replicate, shard_batch)
from mae_clip_tpu.train.metrics import AvgMeter, MetricWriter, Throughput
from mae_clip_tpu.train.optim import (ReduceLROnPlateau, current_lr,
                                      make_optimizer, set_lr_scale,
                                      trainable_mask)
from mae_clip_tpu.train.state import TrainState


def _clip_loss_fn(cfg: Config, mesh: Optional[Mesh]) -> Callable:
    """Local or explicit-collective global contrastive loss.

    Returns ``fn(img, txt, valid, extras)``; ``extras`` carries the
    learnable loss params (SigLIP's ``logit_scale``/``logit_bias``) pulled
    from the model param tree, and is ignored by the softmax objective.
    """
    data_axis = cfg.mesh.axis_names[0]
    # A 1-device mesh still takes the shard_map path when the loss is
    # CHUNKED: the collectives degenerate to identities but the blockwise
    # online-logsumexp evaluation is exactly what lets a 32k-batch
    # objective run on ONE chip without materializing 32k x 32k logits
    # (BASELINE.json config 5 at single-chip scale).
    use_global = (cfg.global_contrastive and mesh is not None
                  and (mesh.shape[data_axis] > 1
                       or cfg.loss_chunk_size > 0))

    if cfg.contrastive_loss == "siglip":
        if not use_global:
            return lambda img, txt, valid, extras: losses_lib.siglip_loss(
                img, txt, extras["logit_scale"], extras["logit_bias"], valid)

        spec = P(data_axis)

        def global_siglip(img, txt, valid, extras):
            return shard_map(
                lambda i, t, v, s, b: losses_lib.global_siglip_loss(
                    i, t, s, b, valid=v, axis_name=data_axis),
                mesh=mesh,
                in_specs=(spec, spec, spec, P(), P()),
                out_specs=P(),
            )(img, txt, valid, extras["logit_scale"], extras["logit_bias"])

        return global_siglip

    def temp_of(extras) -> "jax.Array | float":
        if cfg.learnable_temperature:
            return losses_lib.temperature_of(extras["logit_scale"])
        return cfg.temperature

    hard = cfg.contrastive_loss == "clip"
    if not use_global:
        local_fn = (losses_lib.clip_hard_ce_loss if hard
                    else losses_lib.clip_soft_ce_loss)
        return lambda img, txt, valid, extras=None: \
            local_fn(img, txt, temp_of(extras), valid)

    spec = P(data_axis)
    if hard:
        # The hard-label global loss streams when chunked (one pass).
        fn = functools.partial(losses_lib.global_clip_hard_ce_loss,
                               axis_name=data_axis,
                               chunk_size=cfg.loss_chunk_size)
    elif cfg.loss_chunk_size > 0:
        fn = functools.partial(losses_lib.global_clip_soft_ce_loss_chunked,
                               axis_name=data_axis,
                               chunk_size=cfg.loss_chunk_size)
    else:
        fn = functools.partial(losses_lib.global_clip_soft_ce_loss,
                               axis_name=data_axis)

    def global_loss(img, txt, valid, extras=None):
        tau = jnp.asarray(temp_of(extras), jnp.float32)
        return shard_map(
            lambda i, t, v, u: fn(i, t, valid=v, temperature=u),
            mesh=mesh,
            in_specs=(spec, spec, spec, P()),
            out_specs=P(),
        )(img, txt, valid, tau)

    return global_loss


_LOSS_PARAM_KEYS = ("logit_scale", "logit_bias")


def _loss_extras(params) -> Dict[str, jax.Array]:
    """Learnable loss params (top-level leaves) for :func:`_clip_loss_fn`."""
    return {k: params[k] for k in _LOSS_PARAM_KEYS if k in params}


def _prep_images(images, rng, train: bool, cfg: Config):
    """Device-side image preparation inside the jitted step.

    * uint8 NHWC sources at a geometry other than ``cfg.size`` (the
      ``mae.aug_source_size`` staging convention — staged sources are
      always uint8; float inputs at any geometry are treated as
      already-preprocessed and pass through) get a fresh
      RandomResizedCrop+flip per train step (``ops/augment.py``) or a
      deterministic full-frame resize on eval, then ImageNet normalize —
      the host never re-decodes or re-crops (~30-50x on this container's
      single core; see BASELINE.md "MAE input path").
    * Already-sized uint8 (NHWC or pre-patchified (B, N, P*P*C)) is just
      normalized: 4x less host->HBM traffic than fp32, and the normalize
      rides the VPU fused into the step.
    * Anything else (fp32 at model geometry) passes through untouched.
    """
    if (images.ndim == 4 and images.dtype == jnp.uint8
            and images.shape[1] != cfg.size):
        from mae_clip_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD
        from mae_clip_tpu.ops.augment import (
            random_resized_crop_flip_batch, resize_batch)
        if train:
            images = random_resized_crop_flip_batch(
                images, jax.random.fold_in(rng, 3), cfg.size)
        else:
            images = resize_batch(images, cfg.size)
        return ((images / 255.0 - jnp.asarray(IMAGENET_MEAN))
                / jnp.asarray(IMAGENET_STD))
    if images.dtype == jnp.uint8:
        from mae_clip_tpu.data.images import normalize_uint8
        return normalize_uint8(images)
    return images


def _forward(model, variables, batch, train, rng, cfg: Config,
             mae_masking=None):
    """Run the model, returning (outputs, new_batch_stats)."""
    prepped = _prep_images(batch["image"], rng, train, cfg)
    if prepped is not batch["image"]:
        batch = dict(batch, image=prepped)
    rngs = {}
    mask_rng = None
    if train:
        rngs["dropout"] = jax.random.fold_in(rng, 1)
    if cfg.mae.enabled:
        mask_rng = jax.random.fold_in(rng, 2)
    mutable = ["batch_stats"] if "batch_stats" in variables and train else False
    kwargs = dict(train=train, mask_rng=mask_rng, compute_contrastive=False,
                  mae_masking=mae_masking)
    if mutable:
        out, updates = model.apply(variables, batch, rngs=rngs,
                                   mutable=mutable, **kwargs)
        return out, updates.get("batch_stats")
    out = model.apply(variables, batch, rngs=rngs, **kwargs)
    return out, None


def make_train_step(model, tx, cfg: Config, mesh: Optional[Mesh] = None,
                    accum_steps: int = 1,
                    true_global_contrastive: bool = True):
    """Build the jitted train step: (state, batch) -> (state, metrics).

    ``accum_steps > 1`` enables gradient accumulation: the batch is split
    into that many microbatches scanned sequentially (``lax.scan``), grads
    accumulated, ONE optimizer update — activation memory drops by the same
    factor, enabling 32k-style global batches on few chips.

    With ``true_global_contrastive=True`` (default) accumulation uses the
    GradCache two-pass recipe (Gao et al., arXiv:2101.06983; cf. "Breaking
    the Memory Barrier", arXiv:2410.17243): (1) embed every microbatch with
    no tower gradients kept, (2) compute the contrastive loss — and its
    gradients w.r.t. the cached embeddings — over the FULL batch at once
    (chunked + all-gathered over the mesh when global_contrastive is on),
    (3) re-run each microbatch under ``jax.vjp`` injecting those embedding
    cotangents. Loss and parameter gradients are EXACTLY those of a single
    giant-batch step (the MAE masking is drawn once for the full batch and
    sliced per microbatch), at one extra forward pass (~1.5x step FLOPs)
    but O(microbatch) activation memory — so the "32k batch" recipe is a
    true 32k x 32k contrastive objective. ``False`` restores the cheaper
    per-microbatch approximation (contrastive batch == microbatch x DP).

    BatchNorm towers (resnet50, reference modules.py:17-19): both accum
    modes run with torch gradient-accumulation semantics — train-mode BN
    normalizes each microbatch by its own statistics and running stats
    update sequentially across microbatches — so giant-batch equality is
    exact only for stat-free towers (ViT/LayerNorm); the contrastive
    objective is still the full batch_size x batch_size matrix.
    """
    clip_loss_fn = _clip_loss_fn(cfg, mesh)

    def loss_for(stats, batch, rng, params):
        valid = batch.get("valid")
        variables = {"params": params}
        if stats is not None:
            variables["batch_stats"] = stats
        out, new_stats = _forward(model, variables, batch, True, rng, cfg)
        clip_loss = clip_loss_fn(out["image_embeddings"],
                                 out["text_embeddings"], valid,
                                 _loss_extras(params))
        loss = clip_loss
        metrics = {"clip_loss": clip_loss}
        if "mae_loss" in out:
            metrics["mae_loss"] = out["mae_loss"]
            loss = loss + cfg.mae.loss_weight * out["mae_loss"]
        metrics["loss"] = loss
        return loss, (metrics, new_stats)

    def _microbatches(batch):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                + x.shape[1:]), batch)

    def _legacy_accum(state, batch, rng):
        """Per-microbatch contrastive approximation (pre-GradCache).

        BatchNorm towers: each microbatch normalizes by its OWN batch
        statistics and the running stats are updated sequentially,
        microbatch i+1 seeing i's EMA update — exactly torch's gradient
        accumulation semantics for BN."""
        micro = _microbatches(batch)

        def scan_body(carry, mb):
            acc_grads, acc_metrics, stats, i = carry
            mb_rng = jax.random.fold_in(rng, i)
            (_, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_for, argnums=3, has_aux=True)(stats, mb, mb_rng,
                                                   state.params)
            acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
            acc_metrics = jax.tree_util.tree_map(jnp.add, acc_metrics,
                                                 metrics)
            if stats is None:       # stat-free tower: keep carry static
                new_stats = None
            return (acc_grads, acc_metrics, new_stats, i + 1), None

        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        proto_m = {"clip_loss": 0.0, "loss": 0.0}
        if cfg.mae.enabled:
            proto_m["mae_loss"] = 0.0
        zeros_m = jax.tree_util.tree_map(
            lambda _: jnp.zeros((), jnp.float32), proto_m)
        (grads, metrics, new_stats, _), _ = jax.lax.scan(
            scan_body,
            (zeros_g, zeros_m, state.batch_stats, jnp.zeros((), jnp.int32)),
            micro)
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        metrics = jax.tree_util.tree_map(lambda m: m / accum_steps, metrics)
        return grads, metrics, new_stats

    def _gradcache_accum(state, batch, rng):
        """GradCache two-pass accumulation: loss AND grads bit-match the
        giant-batch step (same full-batch masking rng recipe as
        ``_forward``; microbatch denominators are equal because the masked
        count per sample is static, so mean-of-means == global mean).

        BatchNorm towers (resnet50): train-mode BN normalizes by the
        CURRENT microbatch's statistics — never the running stats — so
        pass 2 reproduces pass 1's forward exactly regardless of which
        running stats are fed, and the embedding cotangents stay valid.
        Giant-batch equality then holds per-microbatch-normalization
        (torch gradient-accumulation semantics), not per-full-batch BN;
        running stats are updated sequentially across microbatches in
        pass 1, exactly as torch accumulation would."""
        batch_size = batch["image"].shape[0]
        mae_masking = None
        if cfg.mae.enabled:
            from mae_clip_tpu.models.clip import _resolved_vit_config
            from mae_clip_tpu.ops.masking import random_masking
            vcfg = _resolved_vit_config(cfg, getattr(model, "vit_config",
                                                     None))
            mae_masking = random_masking(
                jax.random.fold_in(rng, 2), batch_size, vcfg.num_patches,
                cfg.mae.mask_ratio)
        micro = _microbatches(batch)
        micro_masking = (None if mae_masking is None
                         else _microbatches(mae_masking))

        def embed(params, mb, mbm, i, stats):
            # Per-microbatch dropout rng (identical between the two passes,
            # a GradCache requirement; masking comes precomputed, so the
            # fold only decorrelates dropout across microbatches).
            mb_rng = jax.random.fold_in(rng, 16 + i)
            variables = {"params": params}
            if stats is not None:
                variables["batch_stats"] = stats
            out, new_stats = _forward(model, variables, mb, True, mb_rng,
                                      cfg, mae_masking=mbm)
            mae = (out["mae_loss"] if "mae_loss" in out
                   else jnp.zeros((), jnp.float32))
            return (out["image_embeddings"], out["text_embeddings"], mae,
                    new_stats)

        idx = jnp.arange(accum_steps, dtype=jnp.int32)

        # Pass 1: embeddings only; activations are free to die (no grad).
        # Running stats thread sequentially through the carry (BN towers).
        def scan_embed(stats, xs):
            mb, mbm, i = xs
            img, txt, mae, new_stats = embed(state.params, mb, mbm, i,
                                             stats)
            if stats is None:       # stat-free tower: keep carry static
                new_stats = None
            return new_stats, (img, txt, mae)

        new_stats, (imgs, txts, maes) = jax.lax.scan(
            scan_embed, state.batch_stats, (micro, micro_masking, idx))
        emb_dim = imgs.shape[-1]
        img_all = imgs.reshape(batch_size, emb_dim)
        txt_all = txts.reshape(batch_size, emb_dim)

        # Full-batch contrastive loss + its embedding cotangents (and the
        # learnable loss-param grads — SigLIP's scale/bias live only in the
        # loss, so their grads come entirely from this pass).
        valid_all = batch.get("valid")
        extras = _loss_extras(state.params)
        clip_loss, (d_img, d_txt, d_extras) = jax.value_and_grad(
            lambda i, t, e: clip_loss_fn(i, t, valid_all, e),
            argnums=(0, 1, 2))(img_all, txt_all, extras)

        # Pass 2: re-run each microbatch injecting the cached cotangents.
        d_img_m = d_img.reshape(imgs.shape).astype(imgs.dtype)
        d_txt_m = d_txt.reshape(txts.shape).astype(txts.dtype)
        mae_cot = jnp.asarray(
            (cfg.mae.loss_weight / accum_steps) if cfg.mae.enabled else 0.0,
            jnp.float32)

        def scan_grads(acc, xs):
            mb, mbm, di, dt, i = xs
            # BN towers: train-mode output is independent of the running
            # stats fed in, so state.batch_stats reproduces pass 1's
            # forward; the (non-differentiated) stat updates are dropped.
            _, vjp_fn = jax.vjp(
                lambda p: embed(p, mb, mbm, i, state.batch_stats)[:3],
                state.params)
            (g,) = vjp_fn((di, dt, mae_cot))
            return jax.tree_util.tree_map(jnp.add, acc, g), None

        zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        grads, _ = jax.lax.scan(
            scan_grads, zeros_g,
            (micro, micro_masking, d_img_m, d_txt_m, idx))
        if d_extras:
            # Pass 2's vjp never sees the loss-only params (they don't
            # affect the embeddings), so inject their grads directly.
            grads = dict(grads)
            for k, g in d_extras.items():
                grads[k] = grads[k] + g

        metrics = {"clip_loss": clip_loss, "loss": clip_loss}
        if cfg.mae.enabled:
            mae_loss = jnp.mean(maes)
            metrics["mae_loss"] = mae_loss
            metrics["loss"] = clip_loss + cfg.mae.loss_weight * mae_loss
        return grads, metrics, new_stats

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]
                ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(state.rng, state.step)

        if accum_steps == 1:
            (_, (metrics, new_stats)), grads = jax.value_and_grad(
                loss_for, argnums=3, has_aux=True)(
                    state.batch_stats, batch, rng, state.params)
        elif true_global_contrastive:
            grads, metrics, new_stats = _gradcache_accum(state, batch, rng)
        else:
            grads, metrics, new_stats = _legacy_accum(state, batch, rng)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        # Skip the add on frozen leaves: XLA cannot fold their 0*scale
        # updates (scale is runtime), so p + u would read+write the whole
        # frozen tower every step; the identity aliases the donated buffer.
        new_params = jax.tree_util.tree_map(
            lambda p, u, t: p + u.astype(p.dtype) if t else p,
            state.params, updates, trainable_mask(cfg, state.params))
        if cfg.learnable_temperature and "logit_scale" in new_params:
            # CLIP clamps the PARAMETER after each update (arXiv:2103.00020
            # §2.5 — open_clip does torch.clamp_ post-step). The forward
            # min() alone would zero d(loss)/d(logit_scale) once exp(s)
            # crossed 100, freezing the temperature at 0.01 forever (the
            # logit group has no weight decay to pull it back); keeping the
            # param itself <= log(100) means the gradient always flows.
            new_params = dict(new_params)
            new_params["logit_scale"] = jnp.minimum(
                new_params["logit_scale"], jnp.log(100.0).astype(
                    new_params["logit_scale"].dtype))
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(new_stats if new_stats is not None
                         else state.batch_stats),
            ema_params=_ema_update(cfg, state.ema_params, new_params,
                                   state.params))
        return new_state, metrics

    metrics_proto = {"loss": 0, "clip_loss": 0,
                     **({"mae_loss": 0} if cfg.mae.enabled else {})}
    return _compile_step(step_fn, cfg, mesh, metrics_proto)


def _compile_step(step_fn, cfg: Config, mesh: Optional[Mesh],
                  metrics_proto: Dict[str, Any]):
    """jit a (state, batch) -> (state, metrics) step, with data-axis batch
    sharding + donated, rule-sharded state when a mesh is given."""
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    bspec = batch_sharding(mesh, cfg.mesh.axis_names[0])
    rep = NamedSharding(mesh, P())

    def state_shardings(state: TrainState) -> TrainState:
        return TrainState(
            step=rep,
            params=param_shardings(state.params, mesh),
            opt_state=opt_state_shardings(
                state.opt_state, mesh, cfg.mesh.axis_names[0],
                zero1=cfg.mesh.shard_opt_state),
            batch_stats=(None if state.batch_stats is None else
                         jax.tree_util.tree_map(lambda _: rep,
                                                state.batch_stats)),
            rng=rep,
            ema_params=(None if state.ema_params is None else
                        param_shardings(state.ema_params, mesh)))

    def batch_shardings(batch):
        return jax.tree_util.tree_map(lambda _: bspec, batch)

    cache = {}

    def jitted(state, batch):
        # Shardings depend on the pytree structure, known at first call;
        # build the jitted executable once and reuse it (re-wrapping in
        # jax.jit per call would recompile every step).
        if "fn" not in cache:
            cache["fn"] = jax.jit(
                step_fn,
                in_shardings=(state_shardings(state),
                              batch_shardings(batch)),
                out_shardings=(state_shardings(state),
                               jax.tree_util.tree_map(lambda _: rep,
                                                      metrics_proto)),
                donate_argnums=(0,))
        return cache["fn"](state, batch)

    return jitted


def _mae_images_and_forward(model, params, batch, rng, train: bool,
                            cfg: Config):
    """Shared forward for the image-only MAE objective."""
    images = _prep_images(batch["image"], rng, train, cfg)
    rngs = {"dropout": jax.random.fold_in(rng, 1)} if train else {}
    out = model.apply({"params": params}, images,
                      jax.random.fold_in(rng, 2), not train, rngs=rngs)
    weight = out.mask
    if "valid" in batch:
        # Padded ragged-tail rows (pipeline.make_image_loader) get zero
        # weight: the loss mean counts only valid examples' masked patches.
        weight = weight * batch["valid"][:, None].astype(weight.dtype)
    loss = losses_lib.mae_reconstruction_loss(
        out.pred_patches, out.target_patches, weight,
        norm_pix=cfg.mae.norm_pix_loss)
    return loss


def make_mae_pretrain_step(model, tx, cfg: Config,
                           mesh: Optional[Mesh] = None):
    """Image-only MAE pretraining step (He et al., arXiv:2111.06377):
    masked-pixel reconstruction loss only — no text tower, no contrastive
    term. The capability the reference names but never ships (its only
    trace is the commented-out ViT tower, reference modules.py:20-26).
    ``model`` is a standalone ``MAEViT`` (build via ``models.clip.
    mae_vit_for`` so params later transfer into a CLIP image tower).
    """

    def step_fn(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_for(params):
            loss = _mae_images_and_forward(model, params, batch,
                                           rng, True, cfg)
            return loss, {"loss": loss, "mae_loss": loss}

        (_, metrics), grads = jax.value_and_grad(
            loss_for, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u, t: p + u.astype(p.dtype) if t else p,
            state.params, updates, trainable_mask(cfg, state.params))
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            opt_state=new_opt_state,
            ema_params=_ema_update(cfg, state.ema_params, new_params,
                                   state.params))
        return new_state, metrics

    return _compile_step(step_fn, cfg, mesh, {"loss": 0, "mae_loss": 0})


def _ema_update(cfg: Config, ema_params, new_params, params):
    """new_ema = d*ema + (1-d)*new_params over TRAINABLE leaves; frozen
    leaves pass through as identities (aliasing the donated buffer — same
    trick as the frozen-param update skip). No-op when EMA is disabled."""
    if cfg.ema_decay <= 0 or ema_params is None:
        return ema_params
    d = cfg.ema_decay
    return jax.tree_util.tree_map(
        lambda e, p, t: (d * e + (1 - d) * p).astype(e.dtype) if t else e,
        ema_params, new_params, trainable_mask(cfg, params))


def _eval_variables(state: TrainState, cfg: Config) -> dict:
    """Variables evals should run on: the EMA weights when EMA is enabled
    with ema_eval (standard averaged-weights protocol), else the live
    params."""
    if cfg.ema_decay > 0 and cfg.ema_eval and state.ema_params is not None:
        v = {"params": state.ema_params}
        if state.batch_stats is not None:
            v["batch_stats"] = state.batch_stats
        return v
    return state.variables()


def make_mae_eval_step(model, cfg: Config, mesh: Optional[Mesh] = None):
    """Eval twin: deterministic (no dropout), same masking-rng convention."""

    def step_fn(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        loss = _mae_images_and_forward(
            model, _eval_variables(state, cfg)["params"], batch, rng,
            False, cfg)
        return {"loss": loss, "mae_loss": loss}

    return jax.jit(step_fn)


def precompute_text_features(model, variables, dataset,
                             batch_size: int = 512) -> np.ndarray:
    """One-time frozen-text-tower pass over a whole CaptionDataset.

    LiT-style cache: with ``text_trainable=False`` and
    ``frozen_text_eval_mode=True`` the encoder output is a pure function of
    the caption, so computing it per training step wastes ~1/3 of the
    flagship step (measured: the 6-layer DistilBERT forward). Feed the
    result to ``data.pipeline.make_loader(text_features=...)`` and the
    train step skips the tower; only the trainable projection runs.

    Returns (N, text_embedding) float32 (pre-projection CLS features).
    """
    cfg = model.cfg
    if cfg.text_trainable or not cfg.frozen_text_eval_mode:
        raise ValueError(
            "text-feature caching requires a frozen text tower in eval "
            "mode (text_trainable=False, frozen_text_eval_mode=True); "
            "otherwise the tower output is not constant across steps")

    @jax.jit
    def encode(ids, mask):
        return model.apply(variables, ids, mask, method=model.encode_text)

    from mae_clip_tpu.data.pipeline import pad_token_batch

    n = len(dataset)
    out = []
    for start in range(0, n, batch_size):
        count = min(batch_size, n - start)
        ids, mask = pad_token_batch(                 # static-shape tail
            dataset.input_ids[start:start + batch_size],
            dataset.attention_mask[start:start + batch_size], batch_size)
        feats = np.asarray(encode(jnp.asarray(ids), jnp.asarray(mask)),
                           dtype=np.float32)
        out.append(feats[:count])
    return np.concatenate(out) if out else np.zeros((0, 0), np.float32)


def make_eval_step(model, cfg: Config, mesh: Optional[Mesh] = None):
    """Jitted eval step: (state, batch) -> metrics (no grads, no dropout)."""
    clip_loss_fn = _clip_loss_fn(cfg, mesh)

    def step_fn(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        variables = _eval_variables(state, cfg)
        out, _ = _forward(model, variables, batch, False, rng, cfg)
        clip_loss = clip_loss_fn(out["image_embeddings"],
                                 out["text_embeddings"], batch.get("valid"),
                                 _loss_extras(variables["params"]))
        metrics = {"clip_loss": clip_loss, "loss": clip_loss}
        if "mae_loss" in out:
            metrics["mae_loss"] = out["mae_loss"]
            metrics["loss"] = clip_loss + cfg.mae.loss_weight * out["mae_loss"]
        return metrics

    return jax.jit(step_fn)


class Trainer:
    """Epoch-level driver mirroring reference main.py:85-126 semantics."""

    def __init__(self, cfg: Config, model, params, tx=None,
                 batch_stats=None, mesh: Optional[Mesh] = None,
                 checkpoint_manager=None,
                 writer: Optional[MetricWriter] = None,
                 progress: bool = False,
                 objective: str = "clip",
                 train_store=None, valid_store=None,
                 step_checkpoint_manager=None):
        # objective: "clip" = contrastive (+joint MAE when cfg.mae.enabled;
        # model is a CLIPModel). "mae" = image-only MAE pretraining (model
        # is a standalone MAEViT; batches need only {image, valid}).
        if objective not in ("clip", "mae"):
            raise ValueError(f"unknown objective {objective!r}")
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        # Multi-controller (multi-host) runs: every process executes this
        # same Trainer in lockstep over a mesh spanning all processes'
        # devices (docs/MULTIHOST.md). Params/stats arrive as host or
        # process-local arrays from an identical-seed init; replicate
        # them onto the global mesh up front (fully-replicated
        # device_put of identical host data is the one legal multi-
        # controller placement of host values), so the compiled step's
        # in_shardings never have to reshard process-local inputs.
        self._nproc = jax.process_count()
        if self._nproc > 1 and mesh is not None:
            # Device-resident data under multi-controller requires the
            # ROW-SHARDED store (each process staged only its local rows,
            # data.device_store._build_sharded_store_multiprocess); a
            # replicated store assumes one controller can device_put to
            # every mesh device.
            from mae_clip_tpu.data.device_store import ShardedDeviceStore
            for s in (train_store, valid_store):
                if s is not None and not isinstance(s, ShardedDeviceStore):
                    raise ValueError(
                        "replicated device stores assume one controller; "
                        "multi-host device data needs the row-sharded "
                        "store (device_data_sharded=true — "
                        "docs/MULTIHOST.md)")
            rep = NamedSharding(mesh, P())
            _rep = lambda t: jax.tree_util.tree_map(
                lambda a: jax.device_put(np.asarray(a), rep), t)
            params = _rep(params)
            if batch_stats is not None:
                batch_stats = _rep(batch_stats)
        self.tx = tx if tx is not None else make_optimizer(cfg, params)
        rng = jax.random.PRNGKey(cfg.seed)
        self.state = TrainState.create(params, self.tx, rng, batch_stats,
                                       ema=cfg.ema_decay > 0)
        if objective == "mae":
            if cfg.accum_steps > 1:
                raise ValueError(
                    "accum_steps > 1 is a contrastive-memory recipe "
                    "(GradCache); MAE pretraining has no cross-microbatch "
                    "coupling — lower batch_size instead")
            self.train_step = make_mae_pretrain_step(model, self.tx, cfg,
                                                     mesh)
            self.eval_step = make_mae_eval_step(model, cfg, mesh)
        else:
            self.train_step = make_train_step(model, self.tx, cfg, mesh,
                                              accum_steps=cfg.accum_steps)
            self.eval_step = make_eval_step(model, cfg, mesh)
        self.scheduler = ReduceLROnPlateau(cfg.patience, cfg.factor)
        self.checkpoint_manager = checkpoint_manager
        # Step-granular rolling checkpoints (cfg.checkpoint_every_steps;
        # train.checkpoint.StepCheckpointManager) — mid-epoch preemption
        # recovery via restore_mid_epoch + fit(skip_batches=...).
        self.step_checkpoint_manager = step_checkpoint_manager
        self._epoch = 0
        self._ckpt_mark = 0
        self.writer = writer
        self.best_loss = float("inf")
        self.progress = progress
        n_chips = len(mesh.devices.flatten()) if mesh is not None else 1
        self.throughput = Throughput(num_chips=n_chips)
        # Device-resident data (data.device_store): loaders yield
        # {indices, valid} and _prepare gathers the batch HBM->HBM.
        self.train_store = train_store
        self.valid_store = valid_store

    # ------------------------------------------------------------------
    # Device-resident superstep: K steps per dispatch.
    #
    # With the dataset staged in HBM (data.device_store) the per-step cost
    # is no longer H2D or compute — it is the DISPATCH round trip itself
    # (~15-20 ms on a tunneled TPU vs a 26 ms device step; measured: the
    # per-step path sustains ~5.8k pairs/s against a 9.7k step rate).
    # lax.scan over a (K, B) index matrix runs K full optimizer steps in
    # ONE dispatch, gathering each batch HBM->HBM inside the scan, and
    # returns the K per-step losses as one array = one value fetch.
    # Padded tail rows (valid all-False) are skipped via lax.cond so they
    # cannot touch the optimizer state.
    # ------------------------------------------------------------------
    def _superstep_k(self, train: bool) -> int:
        store = self.train_store if train else self.valid_store
        if store is None:
            return 1
        if train and self.cfg.scheduler_step == "batch":
            return 1                     # scheduler needs per-step losses
        if self.progress:
            return 1                     # tqdm postfix needs them too
        k = self.cfg.steps_per_call
        if k == 0:
            k = max(1, self.cfg.metric_fetch_every)
        return max(1, k)

    def _get_superstep(self, train: bool):
        cache_attr = "_sstep_train" if train else "_sstep_eval"
        fn = getattr(self, cache_attr, None)
        if fn is not None:
            return fn
        step = self.train_step if train else self.eval_step
        mesh, axis = self.mesh, self.cfg.mesh.axis_names[0]
        store = self.train_store if train else self.valid_store

        def gather(arrays, i, v):
            # Store-provided gather: plain take for a replicated store,
            # collective-free shard_map local gather for a
            # ShardedDeviceStore (requires the blocked index layout of
            # make_sharded_index_loader).
            batch = store.traced_gather(arrays, i)
            batch["valid"] = v
            if mesh is not None:
                batch = shard_batch(batch, mesh, axis)
            return batch

        if train:
            def sstep(state, arrays, idx, valid):
                def body(st, iv):
                    i, v = iv

                    def run(st):
                        st2, metrics = step(st, gather(arrays, i, v))
                        return st2, metrics["loss"].astype(jnp.float32)

                    def skip(st):
                        return st, jnp.zeros((), jnp.float32)

                    return jax.lax.cond(v.any(), run, skip, st)

                return jax.lax.scan(body, state, (idx, valid))

            fn = jax.jit(sstep, donate_argnums=(0,))
        else:
            def sstep(state, arrays, idx, valid):
                def body(_, iv):
                    i, v = iv
                    metrics = step(state, gather(arrays, i, v))
                    return None, metrics["loss"].astype(jnp.float32)

                return jax.lax.scan(body, None, (idx, valid))[1]

            fn = jax.jit(sstep)
        setattr(self, cache_attr, fn)
        return fn

    def _epoch_superstep(self, loader, k: int, meter: AvgMeter,
                         train: bool, batches_done: int = 0) -> None:
        """Drive one epoch through the K-steps-per-dispatch path. Keeps a
        1-deep pipeline: group g+1 is dispatched before group g's losses
        are fetched, so the fetch round trip overlaps device compute."""
        store = self.train_store if train else self.valid_store
        sstep = self._get_superstep(train)
        pending = []                       # [(losses (K,) device, counts)]

        def drain():
            for dev_losses, counts in pending:
                for v, c in zip(np.asarray(dev_losses), counts):
                    if c:
                        meter.update(float(v), c)
            pending.clear()

        def dispatch(idx_rows, valid_rows):
            nonlocal batches_done
            counts = [int(v.sum()) for v in valid_rows]
            n_real = len(idx_rows)
            # The tail group dispatches at its REAL length: jax.jit
            # retraces once for the remainder shape (one extra compile
            # per distinct tail size) instead of scanning padded
            # valid-all-False cond-skipped steps (round 2 measured 112
            # scanned for 103 real steps per epoch = 8% wasted scan
            # iterations; BASELINE.md "End-to-end epoch rate").
            # Multi-controller: the (K, B) index/valid matrices stay host
            # numpy — every process computes the identical batches from
            # the shared seed, and identical host arrays are the one
            # legal replicated jit input; a local jnp.asarray would
            # commit them to this process's device 0.
            idx = np.stack(idx_rows)
            valid = np.stack(valid_rows)
            if self._nproc == 1:
                idx, valid = jnp.asarray(idx), jnp.asarray(valid)
            if train:
                self.state, losses = sstep(self.state, store.arrays,
                                           idx, valid)
            else:
                losses = sstep(self.state, store.arrays, idx, valid)
            if pending:
                drain()                    # previous group; 1-deep overlap
            pending.append((losses, counts))
            if train:
                self.throughput.update(sum(counts))
                # Step-checkpoint cadence lands on dispatch-group
                # boundaries here (the state only exists between groups).
                batches_done += n_real
                self._maybe_step_checkpoint(batches_done)

        idx_rows, valid_rows = [], []
        for batch in loader:
            idx_rows.append(np.asarray(batch["indices"]))
            valid_rows.append(np.asarray(batch["valid"]))
            if len(idx_rows) == k:
                dispatch(idx_rows, valid_rows)
                idx_rows, valid_rows = [], []
        if idx_rows:
            dispatch(idx_rows, valid_rows)
        drain()

    def _progress_bar(self, iterable, desc: str):
        """tqdm wrapper (the reference's progress UX, main.py:53,66,81)."""
        if not self.progress:
            return iterable
        try:
            from tqdm import tqdm
            return tqdm(iterable, desc=desc)
        except ImportError:
            return iterable

    def _prepare(self, batch, store=None):
        if store is not None and "indices" in batch:
            # Device-resident path: ship only the (B,) index vector; the
            # batch itself is an async HBM->HBM gather.
            if self._nproc > 1:
                # Indices/valid are identical host arrays on every
                # process (shared-seed loaders) — the legal replicated
                # jit input; the gathered arrays come out GLOBAL (the
                # store is row-sharded), so skip shard_batch below.
                gathered = store.gather(np.asarray(batch["indices"]))
                gathered["valid"] = np.asarray(batch["valid"])
                return gathered
            gathered = store.gather(jnp.asarray(batch["indices"]))
            gathered["valid"] = jnp.asarray(batch["valid"])
            batch = gathered
        else:
            # Multi-controller: keep host numpy — shard_batch assembles
            # the global array from each process's local slice directly.
            batch = {k: (v if self._nproc > 1 else jnp.asarray(v))
                     for k, v in batch.items() if k != "caption"}
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh,
                                self.cfg.mesh.axis_names[0])
        return batch

    @staticmethod
    def _count(batch) -> int:
        if "valid" in batch:
            return int(np.asarray(batch["valid"]).sum())
        return int(np.asarray(batch["image"]).shape[0])

    @staticmethod
    def _device_count(prepared):
        """GLOBAL example count of an assembled multi-controller batch.

        Each host only knows its local slice of ``valid``; the global
        count lives on device (the assembled array), so return it as a
        replicated device scalar — ``_drain_pending`` resolves it in the
        same stacked fetch as the losses, keeping the count-weighted
        meters exactly equal to a single-process run's (including ragged
        global tails that leave some hosts with all-padding slices)."""
        if "valid" in prepared:
            return prepared["valid"].sum()
        return int(prepared["image"].shape[0])

    def _device_prefetch(self, loader: Iterable[Dict[str, Any]],
                         store=None):
        """Overlap host->device transfer with compute: the next batch is
        device_put while the current step runs (1-deep pipeline; the
        reference's num_workers analogue on the transfer side)."""
        it = iter(loader)
        prev_raw = prev_dev = None
        for batch in it:
            dev = self._prepare(batch, store=store)
            if prev_dev is not None:
                yield prev_raw, prev_dev
            prev_raw, prev_dev = batch, dev
        if prev_dev is not None:
            yield prev_raw, prev_dev

    def _maybe_step_checkpoint(self, batches_done: int) -> None:
        """Rolling mid-epoch save every ``cfg.checkpoint_every_steps``
        train batches (keyed by global optimizer step; async Orbax)."""
        every = self.cfg.checkpoint_every_steps
        mgr = self.step_checkpoint_manager
        if mgr is None or every <= 0:
            return
        mark = batches_done // every
        if mark <= self._ckpt_mark:
            return
        self._ckpt_mark = mark
        mgr.save(int(self.state.step), self.state,
                 meta={"epoch": self._epoch,
                       "batches_done": batches_done,
                       "scheduler": self.scheduler.state_dict(),
                       "best_loss": self.best_loss})

    @staticmethod
    def _skip(loader: Iterable, n: int):
        """Fast-forward a deterministic per-epoch loader past its first
        ``n`` batches (mid-epoch resume): the remaining sequence is
        identical to the original run's, so resumed training is
        bit-identical (per-step rng folds in the restored state.step)."""
        it = iter(loader)
        for _ in range(n):
            if next(it, None) is None:
                break
        return it

    def train_epoch(self, loader: Iterable[Dict[str, Any]],
                    skip_batches: int = 0) -> AvgMeter:
        meter = AvgMeter("train_loss")
        every = self.cfg.checkpoint_every_steps
        self._ckpt_mark = skip_batches // every if every > 0 else 0
        batches_done = skip_batches
        if skip_batches:
            loader = self._skip(loader, skip_batches)
        self.throughput.start()
        k = self._superstep_k(train=True)
        if k > 1:
            self._epoch_superstep(loader, k, meter, train=True,
                                  batches_done=batches_done)
            self.throughput.stop()
            return meter
        bar = self._progress_bar(
            self._device_prefetch(loader, store=self.train_store), "train")
        # Device->host value fetches are the only true barrier on a remote
        # TPU and cost a full round-trip each; fetching the loss per step
        # (the reference's loss.item(), main.py:64) would serialize the
        # pipeline. Keep losses ON DEVICE and drain every
        # cfg.metric_fetch_every steps — unless something genuinely needs
        # the scalar every batch (batch-mode scheduler, tqdm postfix).
        per_step = (self.cfg.scheduler_step == "batch" or self.progress)
        fetch_every = 1 if per_step else max(1, self.cfg.metric_fetch_every)
        pending = []                    # [(device_loss_scalar, count), ...]
        last = {"loss": 0.0}
        multi = self._nproc > 1

        def drain():
            last["loss"], got = self._drain_pending(pending, meter,
                                                    last["loss"])
            if multi:
                # Global counts only exist on device; fold the drained
                # totals into throughput here instead of per step.
                self.throughput.update(got)

        for raw, batch in bar:
            count = (self._device_count(batch) if multi
                     else self._count(raw))
            self.state, metrics = self.train_step(self.state, batch)
            pending.append((metrics["loss"], count))
            batches_done += 1
            self._maybe_step_checkpoint(batches_done)
            if len(pending) >= fetch_every:
                drain()
            if self.cfg.scheduler_step == "batch":
                # fetch_every == 1 here: drain() above just ran, so
                # last["loss"] is THIS step's loss (reference main.py:60-61).
                self._scheduler_step(last["loss"])
            if not multi:
                self.throughput.update(count)
            if self.progress and hasattr(bar, "set_postfix"):
                bar.set_postfix(train_loss=meter.avg,
                                lr=current_lr(self.cfg, self.state.opt_state,
                                              int(self.state.step)))
        drain()
        self.throughput.stop()
        return meter

    @staticmethod
    def _drain_pending(pending, meter: AvgMeter, last: float
                       ) -> Tuple[float, float]:
        """Fetch all pending (device_loss, count) pairs in ONE device->host
        round trip (stack on device, one value fetch) and fold them into
        the meter. A per-scalar ``float()`` loop costs one full tunnel
        round trip EACH (~70 ms here) — at 26 ms device steps that, not
        compute, dominated the epoch rate. Counts may be device scalars
        (multi-controller global counts, ``_device_count``); they ride
        the same stacked fetch. Zero-count entries (all-padding batches)
        are skipped so the meter never divides by zero. Returns
        (newest loss, total example count drained)."""
        if not pending:
            return last, 0
        n = len(pending)
        dev_counts = {i: c for i, (_, c) in enumerate(pending)
                      if not isinstance(c, (int, np.integer))}
        if n == 1 and not dev_counts:
            vals = [float(pending[0][0])]
        else:
            flat = np.asarray(jnp.stack(
                [jnp.asarray(l, jnp.float32) for l, _ in pending]
                + [jnp.asarray(c, jnp.float32)
                   for c in dev_counts.values()]))
            vals = [float(v) for v in flat[:n]]
            for j, i in enumerate(dev_counts):
                dev_counts[i] = float(flat[n + j])
        total = 0
        for i, (v, (_, c)) in enumerate(zip(vals, pending)):
            count = dev_counts.get(i, c)
            last = v
            if count:
                meter.update(v, count)
            total += count
        pending.clear()
        return last, total

    def valid_epoch(self, loader: Iterable[Dict[str, Any]]) -> AvgMeter:
        meter = AvgMeter("valid_loss")
        k = self._superstep_k(train=False)
        if k > 1:
            self._epoch_superstep(loader, k, meter, train=False)
            return meter
        bar = self._progress_bar(loader, "valid")
        fetch_every = 1 if self.progress else max(
            1, self.cfg.metric_fetch_every)
        pending = []
        multi = self._nproc > 1
        for batch in bar:
            prepared = self._prepare(batch, store=self.valid_store)
            count = (self._device_count(prepared) if multi
                     else self._count(batch))
            metrics = self.eval_step(self.state, prepared)
            pending.append((metrics["loss"], count))
            if len(pending) >= fetch_every:
                self._drain_pending(pending, meter, 0.0)
            if self.progress and hasattr(bar, "set_postfix"):
                bar.set_postfix(valid_loss=meter.avg)
        self._drain_pending(pending, meter, 0.0)
        return meter

    def _scheduler_step(self, metric: float) -> None:
        scale = self.scheduler.step(metric)
        self.state = self.state.replace(
            opt_state=set_lr_scale(self.state.opt_state, scale))

    def restore(self, step: Optional[int] = None) -> int:
        """Resume from a checkpoint: full TrainState (params, optimizer,
        step, rng) + scheduler + best-loss tracking. Returns the restored
        epoch number. The reference cannot do this at all - it saves only
        ``model.state_dict()`` (reference main.py:121), losing the
        optimizer; see SURVEY.md §5."""
        from mae_clip_tpu.train.checkpoint import abstract_like
        if self.checkpoint_manager is None:
            raise ValueError("Trainer has no checkpoint_manager")
        state, meta = self.checkpoint_manager.restore(
            abstract_like(self.state), step)
        self.state = state
        if meta.get("scheduler"):
            self.scheduler.load_state_dict(meta["scheduler"])
        if meta.get("best_loss") is not None:
            self.best_loss = meta["best_loss"]
        restored = step if step is not None else \
            self.checkpoint_manager.latest_step()
        return int(restored)

    def restore_mid_epoch(self, step: Optional[int] = None
                          ) -> Tuple[int, int]:
        """Resume from the newest step-granular checkpoint (preemption
        recovery; ``cfg.checkpoint_every_steps``): restores the full
        TrainState + scheduler + best-loss and returns ``(epoch,
        batches_done)`` — pass them to ``fit(start_epoch=epoch,
        skip_batches=batches_done)`` to continue bit-identically."""
        from mae_clip_tpu.train.checkpoint import abstract_like
        if self.step_checkpoint_manager is None:
            raise ValueError("Trainer has no step_checkpoint_manager")
        state, meta = self.step_checkpoint_manager.restore(
            abstract_like(self.state), step)
        self.state = state
        if meta.get("scheduler"):
            self.scheduler.load_state_dict(meta["scheduler"])
        if meta.get("best_loss") is not None:
            self.best_loss = meta["best_loss"]
        return int(meta["epoch"]), int(meta["batches_done"])

    @staticmethod
    def _call_loader(fn: Callable, epoch: int):
        """Loader factories may take the epoch index (for seeded shuffles)
        or no arguments. Dispatch on the signature — catching TypeError
        from the call itself would swallow TypeErrors raised inside the
        user's factory and silently re-dispatch."""
        import inspect

        try:
            sig = inspect.signature(fn)
        except (TypeError, ValueError):   # uninspectable (builtin/C) callable
            return fn(epoch)
        try:
            sig.bind(epoch)
        except TypeError:
            return fn()
        return fn(epoch)

    def fit(self, train_loader_fn: Callable,
            valid_loader_fn: Callable,
            epochs: Optional[int] = None,
            start_epoch: int = 0,
            skip_batches: int = 0,
            eval_fn: Optional[Callable[["Trainer", int], Dict[str, float]]]
            = None) -> Dict[str, Any]:
        """Full training run; returns history. Loader fns build fresh
        per-epoch iterables (the reference reshuffles per epoch); pass
        ``start_epoch`` (e.g. ``trainer.restore() + 1``) to resume, or
        ``start_epoch + skip_batches`` from ``restore_mid_epoch()`` to
        resume inside an epoch (the first epoch's train loader is
        fast-forwarded; its meter then averages only the remaining
        batches). ``eval_fn(trainer, epoch)`` may return extra scalars
        (recall@K, zero-shot accuracy, ...) written alongside the
        losses."""
        cfg = self.cfg
        history = {"train_loss": [], "valid_loss": []}
        best_epoch = start_epoch - 1
        for epoch in range(start_epoch,
                           epochs if epochs is not None else cfg.epochs):
            self._epoch = epoch
            t0 = time.perf_counter()
            train_meter = self.train_epoch(
                self._call_loader(train_loader_fn, epoch),
                skip_batches=skip_batches if epoch == start_epoch else 0)
            t1 = time.perf_counter()
            valid_meter = self.valid_epoch(
                self._call_loader(valid_loader_fn, epoch))
            t2 = time.perf_counter()
            # Reference quirk: with recipe='py' the epoch-mode scheduler is
            # never stepped (main.py:60-61,107) -> LR stays constant.
            if cfg.scheduler_step == "epoch" and cfg.recipe == "notebook":
                self._scheduler_step(valid_meter.avg)
            history["train_loss"].append(train_meter.avg)
            history["valid_loss"].append(valid_meter.avg)

            is_best = valid_meter.avg < self.best_loss
            if is_best:
                self.best_loss = valid_meter.avg
                best_epoch = epoch
            # Cadence (cfg.checkpoint_every): best-val epochs always saved
            # (reference main.py:118-122 saves ONLY on best), plus every N
            # epochs and the final one; 0 disables saving.
            last = (epochs if epochs is not None else cfg.epochs) - 1
            every = cfg.checkpoint_every
            due = every > 0 and (is_best or epoch == last
                                 or (epoch + 1) % every == 0)
            if self.checkpoint_manager is not None and due:
                self.checkpoint_manager.save(
                    epoch=epoch, state=self.state,
                    metrics={"valid_loss": valid_meter.avg},
                    scheduler=self.scheduler.state_dict(),
                    best_loss=self.best_loss, is_best=is_best)
            t3 = time.perf_counter()
            scalars = {
                "loss/train": train_meter.avg,
                "loss/val": valid_meter.avg,
                "lr": current_lr(cfg, self.state.opt_state,
                                 int(self.state.step)),
                "throughput/examples_per_sec_per_chip":
                    self.throughput.examples_per_sec_per_chip,
                # Epoch-tail attribution (VERDICT r3 asked for setup/epoch
                # cost breakdowns): where the non-train seconds go.
                "time/train_s": round(t1 - t0, 3),
                "time/valid_s": round(t2 - t1, 3),
                "time/ckpt_s": round(t3 - t2, 3),
            }
            # eval_fn cadence: every cfg.eval_every epochs plus the final
            # one (the best-val checkpoint's full metrics come from the
            # separate `cli eval` battery, so no is_best trigger — that
            # would fire every epoch while the run is still improving).
            # Early-stopped runs never reach `epoch == last`, so the
            # about-to-stop epoch also counts as final — otherwise the
            # recorded eval curve would end up to eval_every-1 epochs
            # before the run does (advisor finding, round 4).
            stopping = (cfg.early_stop_patience > 0
                        and epoch - best_epoch >= cfg.early_stop_patience)
            eval_due = eval_fn is not None and (
                epoch == last or stopping
                or (epoch + 1) % cfg.eval_every == 0)
            if eval_due:
                extra = eval_fn(self, epoch) or {}
                scalars["time/eval_s"] = round(time.perf_counter() - t3, 3)
                scalars.update(extra)
                for k, v in extra.items():
                    history.setdefault(k, []).append(v)
            if self.writer is not None:
                self.writer.write_scalars(epoch, scalars)
            # Early stop on valid-loss plateau (cfg.early_stop_patience
            # epochs without a new best; 0 = reference behavior, fixed
            # budget). Runs AFTER checkpoint/metrics/eval so the stopping
            # epoch is fully recorded (incl. eval scalars — see eval_due).
            if stopping:
                history["stopped_early"] = True
                break
        history["best_epoch"] = best_epoch
        history["best_valid_loss"] = self.best_loss
        return history
