from mae_clip_tpu.data.coco import (coco_captions_records,
                                    get_coco_captions_df,
                                    get_coco_captions_test_df)
from mae_clip_tpu.data.flickr import make_train_valid_dfs
from mae_clip_tpu.data.tokenizer import WordPieceTokenizer, build_vocab
from mae_clip_tpu.data.images import (decode_image, device_preprocess,
                                      host_preprocess)
from mae_clip_tpu.data.pipeline import CaptionDataset, make_loader

__all__ = [
    "coco_captions_records", "get_coco_captions_df",
    "get_coco_captions_test_df", "make_train_valid_dfs",
    "WordPieceTokenizer", "build_vocab", "decode_image",
    "device_preprocess", "host_preprocess", "CaptionDataset", "make_loader",
]
