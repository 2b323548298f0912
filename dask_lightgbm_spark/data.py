"""Data-layer helpers: positional column slicing (reference B2) and
feature canonicalization.

The reference slices collections positionally — ``data.iloc[:, :-1]``,
``data.iloc[:, -1]``, ``iloc[:, 1:]`` (``/root/reference/system_tests/
test_fit_predict.py:27-28,44-45``). Spark columns are named, so positional
slicing is a projection over ``df.columns`` — pure metadata, no execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iloc_cols(df: DataFrame, sl: slice | int) -> DataFrame:
    """Positional column projection: ``iloc_cols(df, slice(None, -1))`` ≡
    ``data.iloc[:, :-1]``; an int picks a single column."""
    cols = df.columns
    if isinstance(sl, int):
        return df.select(cols[sl])
    return df.select(*cols[sl])


def features_and_label(
    df: DataFrame, label_pos: int = -1
) -> tuple[DataFrame, list[str], str]:
    """The reference's canonical split: all-but-one columns are features,
    one positional column is the label. Returns (df, feature_cols,
    label_col) — no data movement, just names."""
    cols = df.columns
    label = cols[label_pos]
    feats = [c for c in cols if c != label]
    return df, feats, label
