"""The tutorial-notebook training recipe ("OpenAI CLIP Simple
Implementation.ipynb" cells 13, 47): batch 32, per-tower LRs (head 1e-3 /
image 1e-4 / text 1e-5, weight decay on heads only), trainable text tower,
epoch-level ReduceLROnPlateau stepped on validation loss, 4 epochs,
Flickr8k-style captions.csv.

Usage:
  python examples/train_flickr_notebook_recipe.py \
      --captions-dir /data/flickr8k --image-path /data/flickr8k/Images \
      --vocab vocab.txt
"""

import argparse
import json

import jax
import numpy as np

from mae_clip_tpu.config import notebook_config
from mae_clip_tpu.data.flickr import make_train_valid_dfs
from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer
from mae_clip_tpu.models.clip import CLIPModel
from mae_clip_tpu.models.distilbert import DistilBertConfig
from mae_clip_tpu.train.checkpoint import CheckpointManager
from mae_clip_tpu.train.loop import Trainer
from mae_clip_tpu.train.metrics import MetricWriter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--captions-dir", required=True)
    p.add_argument("--image-path", required=True)
    p.add_argument("--vocab", required=True)
    p.add_argument("--epochs", type=int, default=4)
    args = p.parse_args()

    cfg = notebook_config(image_path=args.image_path, epochs=args.epochs,
                          vocab_file=args.vocab)
    tokenizer = WordPieceTokenizer.from_vocab_file(args.vocab)
    train_df, valid_df = make_train_valid_dfs(args.captions_dir,
                                              debug=cfg.debug)

    def ds(df):
        return CaptionDataset(df["image"].values, df["caption"].values,
                              tokenizer, image_path=cfg.image_path,
                              size=cfg.size, max_length=cfg.max_length)

    train_ds, valid_ds = ds(train_df), ds(valid_df)
    model = CLIPModel(cfg, text_config=DistilBertConfig(
        vocab_size=tokenizer.vocab_size), attn_impl="auto")

    example = next(make_loader(train_ds, cfg.batch_size, num_threads=1))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed),
        {k: v for k, v in example.items() if k != "caption"})

    trainer = Trainer(cfg, model, variables["params"],
                      batch_stats=variables.get("batch_stats"),
                      checkpoint_manager=CheckpointManager(cfg.checkpoints),
                      writer=MetricWriter(cfg.logdir))

    seed = [cfg.seed]

    def train_loader():
        seed[0] += 1
        return make_loader(train_ds, cfg.batch_size, shuffle=True,
                           seed=seed[0])

    history = trainer.fit(train_loader,
                          lambda: make_loader(valid_ds, cfg.batch_size))
    print(json.dumps(history))


if __name__ == "__main__":
    main()
