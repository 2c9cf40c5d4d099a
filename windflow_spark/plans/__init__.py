from windflow_spark.plans.audit import (
    physical_plan,
    pushed_filters,
    read_schema,
    count_exchanges,
    has_broadcast_join,
    has_cartesian,
    wholestage_span_count,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schema",
    "count_exchanges",
    "has_broadcast_join",
    "has_cartesian",
    "wholestage_span_count",
]
