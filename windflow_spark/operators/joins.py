"""Joins: broadcast dimension join (YSB shape) and as-of / stream-stream
correlation join.

The reference's only join is a FlatMap probe of a static hashmap
(src/yahoo_test_cpu/ysb_nodes.hpp:174-206) — i.e. a broadcast map-side
join. The north rule adds a true event-time correlation join: each left
event (assistant turn) matched to the LATEST right event (user/tool
turn) with the same key at ``right.ts <= left.ts`` within a bound —
an as-of join.

Batch shape: equi-join on the key (sort-merge / AQE-skew-handled
exchange) with the time-range as join condition, then keep the latest
right match per left row (max_by, one aggregate — no row_number sort).
At 100 TB the equi-key condition keeps the join from degenerating to a
range-only cross product; AQE skew-join splits hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, on: Sequence[str] | str, how: str = "inner") -> DataFrame:
    """YSB-style static-dimension join: broadcast the small side —
    the Spark-native form of probing an in-memory hashmap per tuple
    (ysb_nodes.hpp:174-206). No shuffle of the fact stream."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    bound: int,
    left_id: Sequence[str],
    right_payload: Sequence[str],
    how: str = "inner",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """As-of join: for each left row, the latest right row with the same
    key and ``left_ts - bound <= right_ts <= left_ts``.

    ``left_id`` — columns uniquely identifying a left row (grouping key
    for picking the single best match). ``right_payload`` — right
    columns to carry; each is emitted via ``max_by`` over the right
    timestamp, so no per-group sort. ``how='left'`` keeps unmatched
    left rows with null payload.

    ``tiebreak`` — right columns appended to the max_by ordering
    (struct(right_ts, *tiebreak)). Without it, duplicate (key, right_ts)
    rows make the picked payload engine-/partitioning-dependent; pass a
    unique right column whenever ties are possible.

    Oracle equivalent: ``pandas.merge_asof`` per key (FIXTURES.md F7).
    Streaming equivalent: watermarked interval join in
    windflow_spark.streaming.
    """
    lts = F.col(f"l.{left_ts}")
    rts = F.col(f"r.{right_ts}")
    cond = (rts <= lts) & (rts >= lts - F.lit(bound))
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    j = left.alias("l").join(right.alias("r"), on=cond, how="left" if how == "left" else "inner")
    group_cols = [F.col(f"l.{c}").alias(c) for c in left_id]
    ord_ = F.struct(rts, *[F.col(f"r.{c}") for c in tiebreak]) if tiebreak else rts
    aggs = [F.max(rts).alias("matched_ts")] + [
        F.max_by(F.col(f"r.{c}"), ord_).alias(f"matched_{c}") for c in right_payload
    ]
    return j.groupBy(*group_cols).agg(*aggs)
