"""Text-to-image retrieval demo (reference: inference.py + the tutorial
notebook's final cells): build a gallery from the validation split, query
with free text, print (and optionally render) the top-9 matches.

Usage:
  python examples/retrieval_demo.py --checkpoint checkpoint_3.pth \
      --vocab vocab.txt --coco-val captions_val2014.json \
      --image-path /data/coco/val2014 --query "a group of people on a beach"
"""

import argparse
import json

from mae_clip_tpu.config import Config
from mae_clip_tpu.data.coco import get_coco_captions_df
from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer
from mae_clip_tpu.eval.retrieval import (compute_image_embeddings,
                                         find_matches, show_matches)
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.train.checkpoint import import_reference_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--coco-val", required=True)
    p.add_argument("--image-path", default="")
    p.add_argument("--query", required=True)
    p.add_argument("-n", type=int, default=9)
    p.add_argument("--show", action="store_true", help="render 3x3 grid")
    args = p.parse_args()

    cfg = Config(model_name="resnet50", compute_dtype="float32",
                 image_path=args.image_path)
    tokenizer = WordPieceTokenizer.from_vocab_file(args.vocab)
    model = CLIPModel(cfg, text_config=DistilBertConfig(
        vocab_size=tokenizer.vocab_size))
    variables = import_reference_checkpoint(args.checkpoint, cfg)

    df = get_coco_captions_df(args.coco_val)
    ds = CaptionDataset(df["image"].values, df["caption"].values, tokenizer,
                        image_path=cfg.image_path, size=cfg.size,
                        max_length=cfg.max_length)
    gallery = compute_image_embeddings(model, variables,
                                       make_loader(ds, cfg.batch_size))
    matches = find_matches(model, variables, gallery, args.query,
                           list(df["image"].values), tokenizer, n=args.n)
    print(json.dumps({"query": args.query, "matches": matches}))
    if args.show:
        show_matches(matches, image_path=args.image_path)


if __name__ == "__main__":
    main()
