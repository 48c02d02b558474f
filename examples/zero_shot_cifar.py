"""Zero-shot CIFAR-10 classification (reference: CIFAR.ipynb cells 0-10).

Loads a checkpoint (framework-native via Orbax, or a reference ``.pth``),
builds "a photo of a {c}" prompts for the 10 CIFAR classes, and either:

* ``--image``: reports top-5 class probabilities for one query image
  (the notebook's cells 6-10), or
* ``--cifar-dir``: runs top-1/top-5 accuracy over a standard offline
  ``cifar-10-batches-py/`` pickle dump (what torchvision's CIFAR10 —
  the notebook's cell 6 input — stores on disk), or
* ``--images``: accuracy over any class-per-subdirectory image tree.

CIFAR-10 itself is not bundled (this environment has no egress); any of
the three inputs works once a dump or image tree exists.

Usage:
  python examples/zero_shot_cifar.py --checkpoint checkpoint_3.pth \
      --vocab vocab.txt --image frog.png
  python examples/zero_shot_cifar.py --checkpoint checkpoint_3.pth \
      --vocab vocab.txt --cifar-dir ./cifar-10-batches-py
"""

import argparse
import json

import jax.numpy as jnp
import numpy as np

from mae_clip_tpu.config import Config
from mae_clip_tpu.data.images import decode_image, host_preprocess
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer
from mae_clip_tpu.eval.zeroshot import (CIFAR10_CLASSES,
                                        build_zero_shot_classifier,
                                        zero_shot_cifar_eval,
                                        zero_shot_dir_eval,
                                        zero_shot_probs)
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.train.checkpoint import import_reference_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help=".pth reference ckpt")
    p.add_argument("--vocab", required=True, help="HF-format vocab.txt")
    p.add_argument("--image", help="single query image (top-5 probs)")
    p.add_argument("--cifar-dir",
                   help="offline cifar-10-batches-py/ pickle dump")
    p.add_argument("--cifar-split", default="test",
                   choices=["test", "train"])
    p.add_argument("--images",
                   help="class-per-subdirectory image tree (accuracy)")
    p.add_argument("--model-name", default="resnet50")
    p.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args()
    if not (args.image or args.cifar_dir or args.images):
        p.error("pass one of --image / --cifar-dir / --images")

    cfg = Config(model_name=args.model_name, compute_dtype="float32")
    tokenizer = WordPieceTokenizer.from_vocab_file(args.vocab)
    model = CLIPModel(cfg, text_config=DistilBertConfig(
        vocab_size=tokenizer.vocab_size))
    variables = import_reference_checkpoint(args.checkpoint, cfg)

    if args.cifar_dir:
        out = zero_shot_cifar_eval(model, variables, tokenizer,
                                   args.cifar_dir, size=cfg.size,
                                   batch_size=args.batch_size,
                                   split=args.cifar_split)
        print(json.dumps(out))
    if args.images:
        out = zero_shot_dir_eval(model, variables, tokenizer, args.images,
                                 size=cfg.size, batch_size=args.batch_size)
        print(json.dumps(out))
    if args.image:
        classifier = build_zero_shot_classifier(model, variables, tokenizer,
                                                CIFAR10_CLASSES)
        img = host_preprocess(decode_image(args.image), cfg.size)[None]
        feats = model.apply(variables, jnp.asarray(img),
                            method=model.encode_image)
        emb = model.apply(variables, feats, method=model.project_image)
        probs = np.asarray(zero_shot_probs(emb, classifier))[0]
        top5 = np.argsort(-probs)[:5]
        print(json.dumps({CIFAR10_CLASSES[i]: round(float(probs[i]), 4)
                          for i in top5}))


if __name__ == "__main__":
    main()
