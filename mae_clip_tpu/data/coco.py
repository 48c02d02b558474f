"""COCO captions adapter.

Same capability as the reference converter (reference:
coco_captions_to_df.py:7-30): flatten a COCO captions annotation JSON into
one (image, caption) row per caption, image file names repeated for their
multiple captions. Offered both as plain records (TPU-pipeline friendly) and
as a pandas DataFrame with the reference's exact columns, so existing
caption dataframes drop in unchanged.
"""

from __future__ import annotations

import json
from typing import List, Tuple


def coco_captions_records(caption_json: str) -> List[Tuple[str, str]]:
    """[(image_file_name, caption), ...] — one row per annotation, in
    annotation order (matching the reference's flattening order)."""
    with open(caption_json, "r") as f:
        annotations = json.load(f)
    id_to_file = {img["id"]: img["file_name"]
                  for img in annotations["images"]}
    return [(id_to_file[ann["image_id"]], ann["caption"])
            for ann in annotations["annotations"]]


def get_coco_captions_df(caption_json: str):
    """DataFrame with columns ['image', 'caption'] (reference API)."""
    import pandas as pd
    records = coco_captions_records(caption_json)
    return pd.DataFrame({"image": [r[0] for r in records],
                         "caption": [r[1] for r in records]})


def get_coco_captions_test_df(caption_json: str, length: int = 100):
    """First ``length`` rows — the reference's debug fixture
    (coco_captions_to_df.py:28-30)."""
    return get_coco_captions_df(caption_json)[:length]
