"""Physical-plan inspection helpers.

"Did the filter push down / did the dim broadcast / did the scan prune
columns" are the three questions that decide whether a plan survives a 100×
scale-up; these helpers make them assertable in tests instead of eyeballed.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists per scan — the column-pruning check: a scan
    reading all columns for a 2-column projection is a bug."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def whole_stage_codegen_ids(df: DataFrame) -> int:
    """Count of whole-stage-codegen spans (wider is better — Python UDFs and
    certain exprs break them). Formatted plans tag them `[codegen id : N]`."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))
