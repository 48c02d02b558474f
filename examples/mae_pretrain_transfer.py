"""MAE-paper workflow: image-only pretraining, then CLIP transfer.

The reference repo is titled "Training CLIP with MAE" (reference
README.md:2) but ships no MAE; this example runs the full workflow the
title promises (He et al., arXiv:2111.06377):

  1. pretrain a MAEViT on an unlabeled image directory (masked-pixel
     reconstruction, RandomResizedCrop+flip augmentation, optional cosine
     schedule);
  2. transfer the pretrained encoder into a CLIP model's image tower;
  3. (optionally) evaluate encoder quality with a linear probe.

Equivalent CLI:
  python -m mae_clip_tpu.cli mae-pretrain --images DIR --set ...
  python -m mae_clip_tpu.cli train --captions-dir ... --init-from-mae RUN
  python -m mae_clip_tpu.cli eval --checkpoint RUN --linear-probe-dir DIR

Usage:
  python examples/mae_pretrain_transfer.py --images /data/images \
      [--probe-dir /data/labelled] [--epochs 2]
"""

import argparse
import json

import jax
import numpy as np

from mae_clip_tpu.config import MAEConfig, mae_pretrain_config
from mae_clip_tpu.data.pipeline import ImageDataset, make_image_loader
from mae_clip_tpu.interop.transfer import load_mae_encoder_into_clip
from mae_clip_tpu.models.clip import CLIPModel, mae_vit_for
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.train.loop import Trainer


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--probe-dir")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=64)
    args = ap.parse_args()

    cfg = mae_pretrain_config(batch_size=args.batch_size,
                              epochs=args.epochs)

    # 1. Pretrain on unlabeled images.
    model = mae_vit_for(cfg)
    ds = ImageDataset.from_directory(args.images, size=cfg.size,
                                     raw_uint8=True, patchify_size=16)
    example = next(make_image_loader(ds, cfg.batch_size, num_threads=1))
    variables = jax.jit(
        lambda r, b: model.init(r, b, jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(cfg.seed),
      np.zeros(example["image"].shape, np.float32))
    trainer = Trainer(cfg, model, variables["params"], objective="mae")

    seed = [cfg.seed]

    def loader():
        seed[0] += 1
        return make_image_loader(ds, cfg.batch_size, shuffle=True,
                                 seed=seed[0], augment=True)

    history = trainer.fit(loader, lambda: make_image_loader(
        ds, cfg.batch_size), epochs=args.epochs)
    print(json.dumps({"pretrain_loss": history["train_loss"]}))

    # 2. Transfer the encoder into a CLIP image tower.
    clip = CLIPModel(cfg, text_config=DistilBertConfig())
    batch = dict(example,
                 image=np.zeros(example["image"].shape, np.float32),
                 input_ids=np.zeros((cfg.batch_size, 16), np.int32),
                 attention_mask=np.ones((cfg.batch_size, 16), np.int32))
    cvars = jax.jit(
        lambda r, b: clip.init(r, b, mask_rng=jax.random.PRNGKey(1))
    )(jax.random.PRNGKey(0), batch)
    clip_params, transferred, skipped = load_mae_encoder_into_clip(
        cvars["params"], trainer.state.params)
    print(json.dumps({"transferred": len(transferred),
                      "skipped": len(skipped)}))

    # 3. Linear probe of the pretrained encoder (needs labelled dirs).
    if args.probe_dir:
        from mae_clip_tpu.eval.linear_probe import linear_probe_dir_eval
        out = linear_probe_dir_eval(
            clip, {"params": clip_params}, args.probe_dir, size=cfg.size)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
