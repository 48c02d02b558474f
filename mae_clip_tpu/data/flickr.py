"""Flickr8k-style caption CSV splitter.

Reproduces the reference split exactly (reference: main.py:20-31): numpy
seed 42, 20% of image ids sampled without replacement as validation, the
rest train; ``debug`` caps the id space at 100. Determinism across hosts
comes for free (pure function of the CSV + seed).
"""

from __future__ import annotations

from typing import Tuple


def make_train_valid_dfs(captions_path: str, debug: bool = False,
                         seed: int = 42, valid_fraction: float = 0.2
                         ) -> Tuple["pandas.DataFrame", "pandas.DataFrame"]:
    import numpy as np
    import pandas as pd

    dataframe = pd.read_csv(f"{captions_path}/captions.csv")
    max_id = dataframe["id"].max() + 1 if not debug else 100
    image_ids = np.arange(0, max_id)
    np.random.seed(seed)
    valid_ids = np.random.choice(
        image_ids, size=int(valid_fraction * len(image_ids)), replace=False)
    valid_set = set(valid_ids.tolist())
    train_mask = ~dataframe["id"].isin(valid_set)
    valid_mask = dataframe["id"].isin(valid_set)
    train_df = dataframe[train_mask].reset_index(drop=True)
    valid_df = dataframe[valid_mask].reset_index(drop=True)
    return train_df, valid_df
