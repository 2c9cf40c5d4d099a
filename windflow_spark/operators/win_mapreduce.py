"""Win_MapReduce: intra-window data parallelism via a salted two-stage
aggregate.

Reference (includes/win_mapreduce.hpp:57-619): tuples of each key are
dealt round-robin to ``map_degree`` workers (wm_nodes.hpp:106-111); each
MAP worker computes a partial window result over its 1/n-th slice
(:147-171); the REDUCE stage combines the ``map_degree`` partials per
window (:172-184). Valid only for combinable (semigroup) partials —
same constraint here.

Spark shape: a salt column splits each (key, gwid) group into
``degree`` sub-groups aggregated independently, then merged:
``groupBy(key, gwid, salt).agg(partial)`` → ``groupBy(key, gwid).agg(merge)``.
This is the classic skew-salting rewrite: a hot (key, window) group's
rows spread over ``degree`` reducers before the final tiny merge. The
reference's round-robin deal is arrival-order-dependent; any
deterministic partition of the window content yields the same merged
result, so we salt by a hash of the unit column (deterministic, no
Python).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from windflow_spark.operators.windows import GWID, WinSpec, assign_wids, win_end_expr


def win_mapreduce(
    df: DataFrame,
    keys: Sequence[str],
    unit_col: Column | str,
    spec: WinSpec,
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    degree: int = 8,
    salt_col: Column | None = None,
    origin: int = 0,
    with_win_end: bool = True,
) -> DataFrame:
    """Salted two-stage windowed aggregation, output-identical to
    ``win_seq`` INC for decomposable aggregates.

    ``degree`` mirrors the reference's ``map_degree`` (must be ≥ 2,
    includes/win_mapreduce.hpp:134-138). ``salt_col`` overrides the
    default deterministic salt (hash of the unit column mod degree).
    """
    if degree < 2:
        raise ValueError("degree must be >= 2 (includes/win_mapreduce.hpp:134-138)")
    u = F.expr(unit_col) if isinstance(unit_col, str) else unit_col
    salt = salt_col if salt_col is not None else F.pmod(F.hash(u), F.lit(degree))
    out = (
        assign_wids(df.withColumn("_salt", salt), unit_col, spec, origin=origin)
        .groupBy(*keys, GWID, "_salt")
        .agg(*[c.alias(n) for n, c in partial_aggs.items()])
        .groupBy(*keys, GWID)
        .agg(*[c.alias(n) for n, c in merge_aggs.items()])
    )
    if with_win_end:
        out = out.withColumn("win_end", win_end_expr(spec, origin=origin))
    return out
