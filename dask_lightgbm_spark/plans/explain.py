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
    certain exprs break them). Formatted plans tag them `[codegen id : N]`.

    NOTE: under AQE an UNEXECUTED DataFrame prints the isFinalPlan=false
    initial plan, which carries no codegen tags at all — execute first
    (or use :func:`executed_formatted_plan`) for a real count."""
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))


def executed_formatted_plan(df: DataFrame) -> str:
    """Formatted plan AFTER materializing the DataFrame — the plan that
    actually ran. Under AQE the pre-execution explain prints the
    isFinalPlan=false initial plan: zero codegen spans and possibly
    different join strategies than the runtime re-plan picks. Collecting
    through the DataFrame's own QueryExecution finalizes the adaptive plan;
    the subsequent explain shows `== Final Plan ==` with real codegen ids,
    AQEShuffleRead coalescing, and runtime-chosen joins."""
    df.collect()
    return formatted_plan(df)


def final_plan_tree(plan: str) -> str:
    """The `== Final Plan ==` tree slice of an executed adaptive plan.

    The formatted text of an executed AQE plan prints BOTH trees (final +
    initial) and detail blocks for the union of their nodes, so counting
    node names over the whole text double-counts anything AQE re-planned
    (an initial SortMergeJoin replaced by a runtime broadcast join would
    appear as both). Falls back to the full text for non-adaptive or
    unexecuted plans."""
    m = re.search(
        r"== Final Plan ==\n(.*?)\n\s*\+- == Initial Plan ==", plan, re.S
    )
    return m.group(1) if m else plan
