"""Model-quality metrics as dataflow expressions — the reference computed
its scores exactly this way (accuracy as ``(dy == dy_pred).sum()/len(dy)``,
R² from residual sums, ``/root/reference/system_tests/
test_fit_predict.py:35,53-56``); here they are reusable single-action
aggregations over prediction DataFrames."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def accuracy(pred: DataFrame, label_col: str, pred_col: str = "prediction") -> float:
    """Fraction of exact label matches (reference accuracy expression)."""
    return pred.agg(
        F.avg((F.col(pred_col) == F.col(label_col)).cast("double"))
    ).first()[0]


def r2(pred: DataFrame, label_col: str, pred_col: str = "prediction") -> float:
    """Coefficient of determination from residual/total sums of squares —
    the reference's two-pass form (mean first, then centered sums,
    test_fit_predict.py:53-56). Two passes on purpose: the one-pass
    sum-of-squares shortcut cancels catastrophically for large label
    magnitudes. Returns NaN for empty input or constant labels."""
    mean_row = pred.agg(F.avg(F.col(label_col)).alias("m")).first()
    if mean_row.m is None:
        return float("nan")
    row = pred.agg(
        F.sum(F.pow(F.col(label_col) - F.col(pred_col), 2)).alias("ss_res"),
        F.sum(F.pow(F.col(label_col) - F.lit(mean_row.m), 2)).alias("ss_tot"),
    ).first()
    if not row.ss_tot:
        return float("nan")
    return 1.0 - row.ss_res / row.ss_tot


def rmse(pred: DataFrame, label_col: str, pred_col: str = "prediction") -> float:
    return pred.agg(
        F.sqrt(F.avg(F.pow(F.col(label_col) - F.col(pred_col), 2)))
    ).first()[0]
