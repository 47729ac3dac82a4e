from prohap_spark.plans.inspect import (
    formatted_plan,
    pushed_filters,
    read_schema_columns,
    has_broadcast_join,
    has_sort_merge_join,
    codegen_stage_count,
    plan_nodes,
    plan_report,
    scans_per_file,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "has_sort_merge_join",
    "codegen_stage_count",
    "plan_nodes",
    "plan_report",
    "scans_per_file",
]
