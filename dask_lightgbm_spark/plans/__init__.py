from dask_lightgbm_spark.plans.explain import (
    executed_formatted_plan,
    final_plan_tree,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "executed_formatted_plan",
    "final_plan_tree",
    "formatted_plan",
    "pushed_filters",
    "scan_columns",
    "has_broadcast_join",
]
