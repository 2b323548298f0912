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
    """Coefficient of determination from residual/total sums of squares
    (reference R² expression) — one pass, no driver-side math beyond the
    final division."""
    row = pred.agg(
        F.sum(F.pow(F.col(label_col) - F.col(pred_col), 2)).alias("ss_res"),
        F.sum(F.pow(F.col(label_col), 2)).alias("ss_raw"),
        F.sum(F.col(label_col)).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    ss_tot = row.ss_raw - row.s * row.s / row.n
    return 1.0 - row.ss_res / ss_tot


def rmse(pred: DataFrame, label_col: str, pred_col: str = "prediction") -> float:
    return pred.agg(
        F.sqrt(F.avg(F.pow(F.col(label_col) - F.col(pred_col), 2)))
    ).first()[0]
