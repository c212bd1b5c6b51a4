"""Train/val/test DataFrame splitting, optionally stratified.

Reference: data/split.py:7-97 (sklearn train_test_split with optional
stratify column, two-stage val/test carving).
"""

from __future__ import annotations

from typing import Optional, Tuple

__all__ = ["train_test_split_dataframe", "train_val_test_split_dataframe"]


def train_test_split_dataframe(
    df,
    test_size: float = 0.2,
    stratify: Optional[str] = None,
    random_seed: Optional[int] = 35,
):
    from sklearn.model_selection import train_test_split

    strat = df[stratify] if stratify is not None else None
    train, test = train_test_split(
        df, test_size=test_size, random_state=random_seed, stratify=strat
    )
    return train, test


def train_val_test_split_dataframe(
    df,
    val_size: float = 0.1,
    test_size: float = 0.1,
    stratify: Optional[str] = None,
    random_seed: Optional[int] = 35,
) -> Tuple:
    train_val, test = train_test_split_dataframe(
        df, test_size=test_size, stratify=stratify, random_seed=random_seed
    )
    val_fraction = val_size / (1.0 - test_size)
    train, val = train_test_split_dataframe(
        train_val, test_size=val_fraction, stratify=stratify, random_seed=random_seed
    )
    return train, val, test
