"""Dual-tower CLIP model (+ optional joint MAE objective).

Functional twin of the reference composite (reference: CLIP.py:9-43): image
tower -> ProjectionHead(2048/384 -> 256), DistilBERT CLS -> ProjectionHead
(768 -> 256), soft-target symmetric InfoNCE. Embeddings are NOT normalized in
the loss (normalization only at inference, reference: inference.py:42-43).

TPU-native additions:
* the image tower is pluggable: ResNet50 (reference default), ViT-S/16 or
  ViT-B/16 (the reference's commented-out intent, modules.py:20-26), or a
  MAE-capable ViT for the joint objective;
* with MAE enabled, the contrastive features can come from the visible-only
  (25%-patch) encoder pass — one shared pass for both losses (the FLIP
  recipe), which is the throughput-optimal joint configuration — or from a
  separate full-sequence pass (``clip_from_masked=False``);
* compute dtype is configurable (bfloat16 on TPU); losses reduce in fp32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mae_clip_tpu.config import Config
from mae_clip_tpu.models.distilbert import DistilBertConfig, TextEncoder
from mae_clip_tpu.models.mae import MAEDecoderConfig, MAEOutput, MAEViT
from mae_clip_tpu.models.projection import ProjectionHead
from mae_clip_tpu.models.resnet import ResNet, resnet50
from mae_clip_tpu.models.vit import VIT_B16, VIT_S16, ViTConfig, ViTEncoder
from mae_clip_tpu.ops import losses as losses_lib


def _dtype_of(name: str):
    # float64 requires jax_enable_x64 (used by fp64 parity tests).
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
            "float16": jnp.float16, "float64": jnp.float64}[name]


def vit_config_for(cfg: Config) -> ViTConfig:
    base = {"vit_s16": VIT_S16, "vit_b16": VIT_B16}[cfg.model_name]
    pos = "sincos" if cfg.mae.enabled else base.pos_embed
    import dataclasses
    return dataclasses.replace(base, image_size=cfg.size, pos_embed=pos)


def _resolved_vit_config(cfg: Config,
                         vit_config: Optional[ViTConfig]) -> ViTConfig:
    """Apply cfg's gelu/head-geometry overrides to the ViT tower config
    (explicitly-passed custom geometry keeps its own head count)."""
    vcfg = vit_config if vit_config is not None else vit_config_for(cfg)
    if cfg.gelu_impl is not None:
        vcfg = dataclasses.replace(vcfg, gelu=cfg.gelu_impl)
    if (vit_config is None and cfg.image_heads is not None
            and vcfg.dim % cfg.image_heads == 0):
        vcfg = dataclasses.replace(vcfg, n_heads=cfg.image_heads)
    return vcfg


def mae_vit_for(cfg: Config, vit_config: Optional[ViTConfig] = None,
                attn_impl: str = "xla",
                attn_interpret: bool = False) -> MAEViT:
    """Standalone MAEViT with the SAME geometry and parameter tree as the
    image tower ``CLIPModel`` embeds when ``cfg.mae.enabled`` — so params
    from image-only MAE pretraining transfer one-to-one into a CLIP model's
    ``image_encoder`` scope (see ``interop.transfer``)."""
    if not cfg.mae.enabled:
        raise ValueError("mae_vit_for requires cfg.mae.enabled")
    vcfg = _resolved_vit_config(cfg, vit_config)
    dec = MAEDecoderConfig(dim=cfg.mae.decoder_dim,
                           depth=cfg.mae.decoder_depth,
                           n_heads=cfg.mae.decoder_heads,
                           gelu=cfg.mae.decoder_gelu)
    return MAEViT(vcfg, decoder=dec, mask_ratio=cfg.mae.mask_ratio,
                  decoder_attn_impl=cfg.mae.decoder_attn_impl,
                  decoder_style=cfg.mae.decoder_style, remat=cfg.remat,
                  block_impl=cfg.fused_blocks,
                  attn_impl=attn_impl, attn_interpret=attn_interpret,
                  dtype=_dtype_of(cfg.compute_dtype),
                  param_dtype=_dtype_of(cfg.param_dtype))


class CLIPModel(nn.Module):
    """``__call__(batch)`` returns a dict with embeddings and losses."""

    cfg: Config
    text_config: DistilBertConfig = DistilBertConfig()
    attn_impl: str = "xla"
    attn_interpret: bool = False
    # None = inherit cfg.mae.clip_from_masked (the config knob); an explicit
    # bool here overrides it (tests / programmatic use).
    clip_from_masked: Optional[bool] = None
    # Explicit ViT geometry override (tests / custom towers); defaults to
    # the geometry implied by cfg.model_name.
    vit_config: Optional[ViTConfig] = None
    # Explicit ResNet geometry override: (stage_sizes, widths) tuples
    # (tests / shallow BN towers — a full random-init resnet50 is
    # numerically chaotic through 53 BatchNorm divisions, so exactness
    # tests need a shallow stack); None = the reference's resnet50.
    resnet_shape: Optional[Tuple[Tuple[int, ...], Tuple[int, ...]]] = None

    def setup(self):
        cfg = self.cfg
        dtype = _dtype_of(cfg.compute_dtype)
        pdtype = _dtype_of(cfg.param_dtype)
        common = dict(dtype=dtype, param_dtype=pdtype)
        attn = dict(attn_impl=self.attn_impl,
                    attn_interpret=self.attn_interpret)

        # cfg.gelu_impl overrides the towers' parity-exact erf GELU (the
        # flagship from-scratch recipe uses "tanh"; see config.Config).
        text_cfg = self.text_config
        if cfg.gelu_impl is not None:
            text_cfg = dataclasses.replace(text_cfg, gelu=cfg.gelu_impl)
        # Head-geometry overrides apply only to canonical tower geometry;
        # an explicitly-passed custom tower config keeps its own heads.
        if cfg.text_heads is not None and text_cfg.dim % cfg.text_heads == 0:
            text_cfg = dataclasses.replace(text_cfg, n_heads=cfg.text_heads)

        if cfg.model_name == "resnet50":
            if cfg.mae.enabled:
                raise ValueError("MAE requires a ViT image tower")
            if self.resnet_shape is not None:
                stages, widths = self.resnet_shape
                self.image_encoder = ResNet(stage_sizes=tuple(stages),
                                            widths=tuple(widths), **common)
            else:
                self.image_encoder = resnet50(**common)
        else:
            vcfg = _resolved_vit_config(cfg, self.vit_config)
            if cfg.mae.enabled:
                self.image_encoder = mae_vit_for(cfg, vcfg, **attn)
            else:
                self.image_encoder = ViTEncoder(vcfg, remat=cfg.remat,
                                                block_impl=cfg.fused_blocks,
                                                **attn, **common)

        self.text_encoder = TextEncoder(text_cfg, remat=cfg.remat,
                                        **attn, **common)
        self.image_projection = ProjectionHead(cfg.projection_dim,
                                               cfg.dropout, **common)
        self.text_projection = ProjectionHead(cfg.projection_dim,
                                              cfg.dropout, **common)
        if cfg.contrastive_loss == "siglip":
            # SigLIP's learnable log-space temperature + bias
            # (arXiv:2303.15343 §4: init t' = log 10, b = -10). Top-level
            # params -> the "logit" optimizer group, excluded from weight
            # decay (train/optim.py labels "logit_*" paths).
            self.logit_scale = self.param(
                "logit_scale",
                lambda _: jnp.asarray(math.log(10.0), jnp.float32))
            self.logit_bias = self.param(
                "logit_bias", lambda _: jnp.asarray(-10.0, jnp.float32))
        elif cfg.learnable_temperature:
            # CLIP-paper learnable temperature: logits scale exp(s),
            # s init = log(1/temperature) so cfg.temperature is the INITIAL
            # T; the loss clamps exp(s) at 100 (arXiv:2103.00020 §2.5).
            self.logit_scale = self.param(
                "logit_scale",
                lambda _: jnp.asarray(math.log(1.0 / cfg.temperature),
                                      jnp.float32))

    # ------------------------------------------------------------------
    def encode_image(self, images: jax.Array, train: bool = False) -> jax.Array:
        """Image features BEFORE projection (reference ImageEncoder output).

        For MAE-enabled towers this is the FULL-sequence pass (all patches):
        masking is a training-time regularizer; inference (retrieval /
        zero-shot, reference inference.py:24) sees every patch.
        """
        if self.cfg.model_name == "resnet50":
            return self.image_encoder(images, train=train)
        if self.cfg.mae.enabled:
            return self.image_encoder.encode_full(images,
                                                  deterministic=not train)
        return self.image_encoder(images, deterministic=not train)

    def encode_text(self, input_ids: jax.Array, attention_mask: jax.Array,
                    train: bool = False) -> jax.Array:
        det = (not train) or (not self.cfg.text_trainable
                              and self.cfg.frozen_text_eval_mode)
        return self.text_encoder(input_ids, attention_mask,
                                 deterministic=det)

    def project_image(self, feats: jax.Array, train: bool = False) -> jax.Array:
        return self.image_projection(feats, deterministic=not train)

    def project_text(self, feats: jax.Array, train: bool = False) -> jax.Array:
        return self.text_projection(feats, deterministic=not train)

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, jax.Array], train: bool = False,
                 mask_rng: Optional[jax.Array] = None,
                 loss_axis_name: Optional[str] = None,
                 compute_contrastive: bool = True,
                 mae_masking=None) -> Dict[str, jax.Array]:
        """Forward pass producing embeddings + losses.

        Args:
          batch: dict with ``image`` (B, H, W, C), ``input_ids`` (B, S),
            ``attention_mask`` (B, S), optional ``valid`` (B,).
          train: enables dropout / BN batch stats.
          mask_rng: rng for MAE masking (required when MAE is enabled).
          loss_axis_name: if set, the contrastive loss is computed globally
            over this mesh axis (all-gather, for use under shard_map).
          compute_contrastive: if False, skip the contrastive loss (the
            caller computes it, e.g. under shard_map in the train step);
            the (purely local) MAE loss is still returned.
          mae_masking: optional precomputed MaskingResult rows (microbatch
            slices of a full-batch draw; see MAEViT.__call__).
        """
        cfg = self.cfg
        valid = batch.get("valid")
        mae_out: Optional[MAEOutput] = None

        if cfg.model_name == "resnet50":
            image_features = self.image_encoder(batch["image"], train=train)
        elif cfg.mae.enabled:
            if mask_rng is None:
                mask_rng = jax.random.PRNGKey(0)
            mae_out = self.image_encoder(batch["image"], mask_rng,
                                         deterministic=not train,
                                         masking=mae_masking)
            from_masked = (self.clip_from_masked
                           if self.clip_from_masked is not None
                           else cfg.mae.clip_from_masked)
            if from_masked:
                # FLIP recipe: one shared visible-patch (25%) pass feeds
                # both objectives — the throughput-optimal configuration.
                image_features = mae_out.pooled
            else:
                # Classic joint objective: the contrastive branch sees a
                # SEPARATE full-sequence pass over the same tower params
                # (identical to what inference's encode_image runs); the
                # masked pass above feeds only the MAE reconstruction loss.
                image_features = self.image_encoder.encode_full(
                    batch["image"], deterministic=not train)
        else:
            image_features = self.image_encoder(batch["image"],
                                                deterministic=not train)

        if "text_features" in batch:
            # Precomputed FROZEN-tower features (B, text_embedding): the
            # LiT-style cache — with text_trainable=False and eval-mode
            # dropout the encoder output is a pure function of the caption,
            # so it is computed once per dataset (train.loop.Trainer /
            # data.pipeline.make_loader) and the whole tower is skipped
            # here. Only the (trainable) projection runs per step.
            text_features = batch["text_features"]
        else:
            # A frozen text tower runs deterministic (LiT-style) unless the
            # reference-faithful recipe disables it
            # (cfg.frozen_text_eval_mode).
            text_det = (not train) or (not cfg.text_trainable
                                       and cfg.frozen_text_eval_mode)
            text_features = self.text_encoder(batch["input_ids"],
                                              batch["attention_mask"],
                                              deterministic=text_det)
        image_embeddings = self.image_projection(image_features,
                                                 deterministic=not train)
        text_embeddings = self.text_projection(text_features,
                                               deterministic=not train)

        out: Dict[str, Any] = {
            "image_embeddings": image_embeddings,
            "text_embeddings": text_embeddings,
        }
        if compute_contrastive:
            if cfg.contrastive_loss == "siglip":
                if loss_axis_name is not None:
                    clip_loss = losses_lib.global_siglip_loss(
                        image_embeddings, text_embeddings, self.logit_scale,
                        self.logit_bias, valid, axis_name=loss_axis_name)
                else:
                    clip_loss = losses_lib.siglip_loss(
                        image_embeddings, text_embeddings, self.logit_scale,
                        self.logit_bias, valid)
            else:
                temperature = (losses_lib.temperature_of(self.logit_scale)
                               if cfg.learnable_temperature
                               else cfg.temperature)
                hard = cfg.contrastive_loss == "clip"
                if loss_axis_name is not None:
                    global_fn = (losses_lib.global_clip_hard_ce_loss if hard
                                 else losses_lib.global_clip_soft_ce_loss)
                    clip_loss = global_fn(
                        image_embeddings, text_embeddings, temperature,
                        valid, axis_name=loss_axis_name)
                else:
                    local_fn = (losses_lib.clip_hard_ce_loss if hard
                                else losses_lib.clip_soft_ce_loss)
                    clip_loss = local_fn(
                        image_embeddings, text_embeddings, temperature,
                        valid)
            out["clip_loss"] = clip_loss
            out["loss"] = clip_loss
        if mae_out is not None:
            # Padded tail rows (valid=False) must not contribute: zero
            # their patch mask so the masked-patch mean skips them (the
            # contrastive term above and the standalone MAE path both
            # already honor `valid`).
            mae_mask = mae_out.mask.astype(jnp.float32)
            if valid is not None:
                mae_mask = mae_mask * valid.astype(jnp.float32)[:, None]
            mae_loss = losses_lib.mae_reconstruction_loss(
                mae_out.pred_patches, mae_out.target_patches, mae_mask,
                norm_pix=cfg.mae.norm_pix_loss)
            out["mae_loss"] = mae_loss
            if compute_contrastive:
                out["loss"] = out["clip_loss"] + cfg.mae.loss_weight * mae_loss
        return out


if __name__ == "__main__":
    # Reference parity: the repo's only self-test is `python CLIP.py`
    # (reference CLIP.py:54-66 — random 8x3x224x224 batch, one forward,
    # print the loss). Same smoke here, jitted (eager remote execution is
    # ~100x slow on a tunneled TPU). The real coverage lives in tests/.
    import jax
    import numpy as np

    cfg = Config()
    model = CLIPModel(cfg, text_config=DistilBertConfig(n_layers=2))
    _rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            _rng.normal(size=(8, 224, 224, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(
            _rng.integers(5, 300, size=(8, 25)).astype(np.int32)),
        "attention_mask": jnp.ones((8, 25), jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = jax.jit(model.apply)(variables, batch)
    print("loss", float(out["loss"]))
