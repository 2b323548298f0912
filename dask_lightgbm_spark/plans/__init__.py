from dask_lightgbm_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
)

__all__ = ["formatted_plan", "pushed_filters", "scan_columns", "has_broadcast_join"]
