"""Session windows — engine extension (no reference counterpart; the
reference supports only CB/TB tumbling/sliding/hopping, SURVEY.md §2.7).

Batch shape: classic gap-split — per key, a new session starts when the
gap to the previous event exceeds ``gap``; session id is the running
count of session starts. One shuffle (partitionBy key + sort), then a
hash aggregate. Streaming uses native ``F.session_window`` (see
windflow_spark.streaming), which merges state-store sessions under the
watermark; the batch gap-split is its exact batch semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def session_windows(
    df: DataFrame,
    keys: Sequence[str],
    unit_col: Column | str,
    gap: int,
    aggs: dict[str, Column],
    session_col: str = "session_id",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-split session aggregation.

    ``unit_col``: integer event-time units (e.g. unix micros).
    Output: one row per (key, session) with ``session_id`` (0-based per
    key), ``session_start``, ``session_end`` (inclusive, last event
    time) and the requested aggregates.

    A new session starts when the gap to the previous event is
    ``> gap`` — the same merge rule as Spark's native
    ``F.session_window``, which merges events whose distance is ≤ the
    gap duration (verified at the boundary: events exactly gap apart
    merge in both engines — tests/test_streaming.py session boundary
    test), so batch and streaming agree.

    ``tiebreak``: extra columns appended to the per-key ordering. Tied
    event times make lag/running-sum assignment engine-dependent; pass a
    unique column (e.g. an event id) whenever ties are possible so the
    split is deterministic across engines and partitionings.
    """
    t = (F.expr(unit_col) if isinstance(unit_col, str) else unit_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(t, *[F.col(c) for c in tiebreak])
    gapped = df.withColumn(
        "_new_session",
        F.when(t - F.lag(t).over(w) > F.lit(gap), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn(
        session_col,
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        gapped.groupBy(*keys, session_col)
        .agg(
            F.min(t).alias("session_start"),
            F.max(t).alias("session_end"),
            *[c.alias(n) for n, c in aggs.items()],
        )
    )
