"""Train/test split protocols (ref ``src/data_processing/split_train_test.py``).

Decoupled from the reference's filesystem layout: callers pass metadata
DataFrames and feature matrices; sklearn's ``train_test_split`` keeps the
split bit-identical to the reference for a given ``random_state``
(``process_other``, ref :108-154 — the repeat protocol uses
``random_state = ceil(8.8 * i)``, ref ``model_regression.py:555``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split

from relaxtpu.data.mos import mos_1_5_to_1_100


def _drop_greyscale(df: pd.DataFrame, features: np.ndarray, grey_indices):
    if grey_indices is None or len(grey_indices) == 0:
        return df.reset_index(drop=True), features
    df = df.drop(index=list(grey_indices)).reset_index(drop=True)
    features = np.delete(features, list(grey_indices), axis=0)
    return df, features


def split_other(
    df: pd.DataFrame,
    features: np.ndarray,
    test_size: float,
    random_state: int | None,
    grey_indices=None,
):
    """Random holdout by unique vid (ref ``process_other:108-154``).

    Greyscale rows are dropped first (the reference does this for
    youtube_ugc).  Returns (X_train, y_train, X_test, y_test, test_vids).
    """
    df, features = _drop_greyscale(df, features, grey_indices)
    # np.asarray: pandas >=3 returns arrow-backed arrays for string columns,
    # which sklearn's indexing rejects
    unique_vids = np.asarray(df["vid"].unique())
    train_vids, test_vids = train_test_split(
        unique_vids, test_size=test_size, random_state=random_state
    )
    train_mask = df["vid"].isin(train_vids)
    test_mask = df["vid"].isin(test_vids)
    x_train = features[df.index[train_mask]]
    x_test = features[df.index[test_mask]]
    y_train = df.loc[train_mask, "mos"].to_numpy(dtype=float)
    y_test = df.loc[test_mask, "mos"].to_numpy(dtype=float)
    return x_train, y_train, x_test, y_test, test_vids


def split_lsvq(
    train_df: pd.DataFrame,
    test_df: pd.DataFrame,
    train_features: np.ndarray,
    test_features: np.ndarray,
    grey_train=None,
    grey_test=None,
):
    """Fixed LSVQ train/test split (ref ``process_lsvq:61-106``)."""
    train_df, train_features = _drop_greyscale(train_df, train_features, grey_train)
    test_df, test_features = _drop_greyscale(test_df, test_features, grey_test)
    y_train = train_df["mos"].to_numpy(dtype=float)
    y_test = test_df["mos"].to_numpy(dtype=float)
    return train_features, y_train, test_features, y_test, test_df["vid"]


def split_cross_dataset(
    train_df: pd.DataFrame,
    test_df: pd.DataFrame,
    train_features: np.ndarray,
    test_features: np.ndarray,
    train_name: str = "youtube_ugc",
    test_name: str = "cvd_2014",
    grey_train=None,
    grey_test=None,
):
    """Cross-dataset split with 1-5 -> 1-100 MOS mapping for konvid/youtube
    sources (ref ``process_cross_dataset:8-58``)."""
    train_df, train_features = _drop_greyscale(train_df, train_features, grey_train)
    test_df, test_features = _drop_greyscale(test_df, test_features, grey_test)
    y_train = train_df["mos"].to_numpy(dtype=float)
    y_test = test_df["mos"].to_numpy(dtype=float)
    if train_name in ("konvid_1k", "youtube_ugc"):
        y_train = mos_1_5_to_1_100(y_train)
    if test_name in ("konvid_1k", "youtube_ugc"):
        y_test = mos_1_5_to_1_100(y_test)
    return train_features, y_train, test_features, y_test, test_df["vid"]
