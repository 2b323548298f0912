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


def unpartitioned_window_exprs(df: DataFrame) -> list[str]:
    """Window expressions that would trigger WindowExec's ``No Partition
    Defined`` warning (all rows to ONE partition) — read from the
    OPTIMIZED LOGICAL plan, so no execution is needed.

    Catalyst prints a logical Window node's non-empty specs in order:
    ``Window [exprs], [partitionSpec], [orderSpec]`` when both are set,
    ``Window [exprs], [spec]`` when exactly one is, and ``Window
    [exprs]`` when neither. Order-spec entries always carry an
    ``ASC``/``DESC`` direction marker and partition entries never do,
    which disambiguates the two-group case (verified against Spark 4.1
    output for all four shapes). Returns one (possibly truncated)
    window-expression string per unpartitioned node."""
    tree = df._jdf.queryExecution().optimizedPlan().treeString()
    out: list[str] = []
    for raw in tree.split("\n"):
        line = raw.lstrip(" :+-")
        if not line.startswith("Window ["):
            continue
        groups, depth, start = [], 0, None
        for i, ch in enumerate(line):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(line[start : i + 1])
        if len(groups) >= 3:
            continue  # both specs present -> partitioned
        if len(groups) == 2 and not re.search(r" (ASC|DESC) ", groups[1]):
            continue  # lone spec has no direction marker -> partitionSpec
        out.append(groups[0][:200] if groups else line[:200])
    return out


# Adjudicated global (unpartitioned) windows in the catalog — r13 verdict
# #4: every WindowExec "No Partition Defined" site must carry an explicit
# bound on the rows that reach the single partition, checkable in
# docs/PLANS.md and enforced by tests/test_plans.py. Two legitimate
# shapes exist (the r8 audit): a rank over an ALREADY-AGGREGATED
# intermediate whose cardinality is the group-key domain (bounded,
# SF-invariant or near), and queries where the global order IS the
# requested semantics over a bounded result. Anything else — a global
# window over an SF-growing input — is a bug; grouped_topk/range-
# partitioned rank is the scale path.
# name -> bound argument for every global-window node the query plans.
# The r13 bench log's 41 WindowExec warnings collapse to exactly these 6
# structural sites (7 nodes; the rest are per-execution repeats across
# bench legs) — enumerated by running unpartitioned_window_exprs over
# the whole batch catalog (tools/dump_plans.py regenerates the table in
# docs/PLANS.md; tests/test_plans.py fails on any site added without a
# bound written here).
WINDOW_ALLOWLIST: dict[str, str] = {
    "q39_moving_window_frame": (
        "7-day moving sum over daily revenue: window input is the "
        "date-grain aggregate — one row per day, ≤ ~2.4k rows at any SF "
        "(TPC-H date domain 1992-1998). The global order IS the query."
    ),
    "q69_global_sorted_sink": (
        "running sum over per-FILE row counts of the sorted sink: one "
        "row per output file; file count = the writer's partition count, "
        "set by the sink config, SF-independent by policy."
    ),
    "q85_join_key_skew_report": (
        "grouped_topk([], k=5, n_salt=64) phase-2 re-rank: input is the "
        "phase-1 survivors, ≤ 64×5 = 320 rows by construction — the "
        "SF-growing key-count table is ranked under the salted "
        "partitioned window in phase 1."
    ),
    "t16_token_zipf": (
        "grouped_topk([], k=25, n_salt=64) phase-2 re-rank: ≤ 64×25 = "
        "1600 rows by construction; the full vocabulary is only ever "
        "ranked within salt partitions."
    ),
    "t22_mixture_allocation": (
        "largest-remainder seat allocation: both global nodes (base-sum "
        "and remainder rank) run over one row per mixture SOURCE — the "
        "source domain is the pipeline config, O(10), SF-invariant."
    ),
    "t30_sequence_packing": (
        "two-level distributed prefix sum, level 2: the global running "
        "sum folds one row per pack-BLOCK (partition-level totals), "
        "bounded by the partition count, not the row count "
        "(operators/prefix_sum.py is the designed scale path)."
    ),
}


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
