from dask_lightgbm_spark.plans.explain import (
    executed_formatted_plan,
    final_plan_tree,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
    unpartitioned_window_exprs,
    WINDOW_ALLOWLIST,
)

__all__ = [
    "executed_formatted_plan",
    "final_plan_tree",
    "formatted_plan",
    "pushed_filters",
    "scan_columns",
    "has_broadcast_join",
    "unpartitioned_window_exprs",
    "WINDOW_ALLOWLIST",
]
