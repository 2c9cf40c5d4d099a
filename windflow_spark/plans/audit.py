"""Physical-plan audit helpers: the engine's plan-shape contract.

These inspect the compiled physical plan (executedPlan: exchanges
inserted, AQE not yet run — the deterministic static shape) and back
the plan-quality tests: filters reach the parquet scan, scans read only needed columns,
small dims broadcast, no accidental cartesian products, aggregates use
a bounded number of exchanges.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed plan (post EnsureRequirements, so Exchange nodes are
    visible; AQE wrapper shows the initial plan before runtime
    re-optimization — the static shape we assert)."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of all file scans."""
    plan = physical_plan(df)
    return " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))


def read_schema(df: DataFrame) -> list[str]:
    """Column names in every FileScan ReadSchema (pruning check)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols += [c.split(":")[0].strip() for c in m.split(",") if c.strip()]
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the static plan (broadcast exchanges not
    counted — they don't move the big side)."""
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")


def has_broadcast_join(df: DataFrame) -> bool:
    p = physical_plan(df)
    return "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in physical_plan(df)


def wholestage_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — fewer spans over the same ops
    = wider fusion."""
    return len(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))
