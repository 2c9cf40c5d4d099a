"""CEP sequence matching over keyed, id-ordered event tables/streams.

The north rule names a "structured-streaming / CEP engine". The
reference (WindFlow) calls its operators "patterns" (SURVEY §2 — all
covered elsewhere) but ships no event-SEQUENCE matching, so this module
is an extension in the same spirit as sessions/asof (COVERAGE 2.7):
strict-contiguity sequence match — SASE-style SEQ with overlapping
matches — expressed Spark-first.

- Batch (`match_events`): pure lead() window expressions — ONE shuffle
  by key, whole-stage codegen, no Python. A k-step pattern is k boolean
  projections + (k-1) leads + one id-contiguity lead; Catalyst folds it
  into a single Window node.
- Streaming (`windflow_spark.streaming.engine.stream_match_events`):
  bounded-carry stateful processor — state is exactly the last k-1 rows
  per key (ids + step flags + ts), so state size is O(keys × k), never
  O(stream). A match emits exactly once, when its completing row
  arrives; there are no partial matches to flush at EOS (a sequence
  either completed or it didn't).

Contract: ``id_col`` is a per-key DENSE monotone integer id (the
TS_RENUMBERING contract the CB operators already use — cb_ids /
turn_idx). Strict contiguity is enforced as ``id(end) == id(start) +
k - 1``; because ids are strictly increasing integers, that single
check pins every intermediate row too. On non-dense ids the check
makes gaps unmatched (strictness), it does not crash.

100 TB posture: batch is one hash-partition shuffle on the key + a
sorted window scan (the same shape as any keyed window agg; skew =
hot keys, same salting story as Key_Farm); streaming state is k-1
rows/key regardless of stream length.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def match_events(
    df: DataFrame,
    keys: str | Sequence[str],
    id_col: str,
    steps: Sequence[Column],
    ts_col: str | None = None,
    within: int | None = None,
    mode: str = "strict",
) -> DataFrame:
    """All overlapping matches of ``steps`` per key.

    ``steps``: one boolean Column predicate per pattern step, each
    evaluated on its own row (nulls count as False). ``ts_col``: an
    integer epoch-micros column (the engine-wide `epoch_us` contract);
    when given, ``ts_first``/``ts_last`` are emitted and ``within``
    bounds ``ts_last - ts_first``. Returns (keys..., start_id, end_id
    [, ts_first, ts_last]) — one row per match start.

    ``mode="strict"``: strict contiguity (SASE SEQ with no skipping) —
    the k rows must be id-consecutive; requires DENSE per-key ids.
    ``mode="skip"``: skip-till-next-match — each step binds to the
    EARLIEST later row satisfying it, other rows in between are
    ignored ("user asks → tool call → assistant answers, other turns
    between"). Every step-0 row starts its own (possibly overlapping)
    match; greedy-earliest binding means a ``within`` bound is exact —
    if the earliest completion exceeds it, every other completion
    would too. Ids only need to be strictly increasing per key, not
    dense. Plan: ONE keyed window (per-step next-occurrence pointers =
    a reverse running min + lead) plus k-2 EQUI joins on (key, id)
    chaining the pointers (+1 join fetching ts_last) — cost
    O(starts) per step, never a posting-list product.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    k = len(steps)
    if k < 2:
        raise ValueError("a sequence pattern needs at least 2 steps")
    if within is not None and ts_col is None:
        raise ValueError("within requires ts_col")
    if mode not in ("strict", "skip"):
        raise ValueError(f"unknown mode {mode!r}: expected 'strict' or 'skip'")
    if mode == "skip":
        return _match_events_skip(df, keys, id_col, steps, ts_col, within)
    w = Window.partitionBy(*keys).orderBy(id_col)
    out = df
    for j, s in enumerate(steps):
        out = out.withColumn(f"_s{j}", F.coalesce(s.cast("boolean"), F.lit(False)))
    cond = F.col("_s0")
    for j in range(1, k):
        cond = cond & F.coalesce(F.lead(f"_s{j}", j).over(w), F.lit(False))
    # dense monotone ids: end == start + k-1 pins all intermediates
    cond = cond & (F.lead(F.col(id_col), k - 1).over(w) == F.col(id_col) + (k - 1))
    sel = [
        *keys,
        F.col(id_col).cast("long").alias("start_id"),
        (F.col(id_col) + (k - 1)).cast("long").alias("end_id"),
    ]
    if ts_col is not None:
        out = out.withColumn("_ts_last", F.lead(ts_col, k - 1).over(w))
        if within is not None:
            cond = cond & ((F.col("_ts_last") - F.col(ts_col)) <= within)
        sel += [
            F.col(ts_col).cast("long").alias("ts_first"),
            F.col("_ts_last").cast("long").alias("ts_last"),
        ]
    # window expressions are not allowed in WHERE — project the match
    # flag first (Catalyst still evaluates one Window node)
    return out.withColumn("_match", cond).filter("_match").select(*sel)


def _match_events_skip(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    steps: Sequence[Column],
    ts_col: str | None,
    within: int | None,
) -> DataFrame:
    """skip-till-next-match: greedy-earliest step binding via
    next-occurrence pointers.

    ``_nxt{j}`` at a row = the smallest id STRICTLY AFTER the row whose
    step-j predicate holds: a running min of step-j ids over the
    (currentRow, unboundedFollowing) frame, shifted back one row with
    lead() — both in the same keyed Window (one exchange). The greedy
    chain b1 = _nxt1(start), b_j = _nxt{j}(row at b_{j-1}) is then k-2
    equi joins on (key, id): each start row matches exactly one row per
    join, so cost is O(starts × k) — the quadratic "all pairs within
    the span" shape never appears in the plan (plan-tested)."""
    k = len(steps)
    w = Window.partitionBy(*keys).orderBy(id_col)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    base = df
    for j, s in enumerate(steps):
        base = base.withColumn(
            f"_s{j}", F.coalesce(s.cast("boolean"), F.lit(False))
        )
    for j in range(1, k):
        nxt_here = F.min(
            F.when(F.col(f"_s{j}"), F.col(id_col).cast("long"))
        ).over(fwd)
        base = base.withColumn(f"_nxt{j}", F.lead(nxt_here, 1).over(w))
    sel_ts = [F.col(ts_col).cast("long").alias("ts_first")] if ts_col else []
    cur = base.filter("_s0").select(
        *keys,
        F.col(id_col).cast("long").alias("start_id"),
        *sel_ts,
        F.col("_nxt1").alias("_b"),
    )

    def _chain(lhs: DataFrame, rhs: DataFrame, keep: list[str]) -> DataFrame:
        """Equi-join lhs._b == rhs._rid on (keys, id): renamed join
        columns keep the self-join unambiguous."""
        rhs = rhs.withColumnsRenamed({kk: f"_r_{kk}" for kk in keys})
        cond = lhs["_b"] == rhs["_rid"]
        for kk in keys:
            cond = cond & (lhs[kk] == rhs[f"_r_{kk}"])
        return lhs.join(rhs, cond, "inner").select(*keep)

    for j in range(2, k):
        rhs = base.select(
            *keys,
            F.col(id_col).cast("long").alias("_rid"),
            F.col(f"_nxt{j}").alias("_bn"),
        )
        cur = _chain(
            cur, rhs,
            [*keys, "start_id", *(["ts_first"] if ts_col else []),
             F.col("_bn").alias("_b")],
        ).filter(F.col("_b").isNotNull())
    cur = cur.filter(F.col("_b").isNotNull())
    if ts_col is None:
        return cur.select(*keys, "start_id", F.col("_b").alias("end_id"))
    rhs = base.select(
        *keys,
        F.col(id_col).cast("long").alias("_rid"),
        F.col(ts_col).cast("long").alias("ts_last"),
    )
    out = _chain(
        cur, rhs,
        [*keys, "start_id", "ts_first", F.col("_b").alias("end_id"), "ts_last"],
    )
    if within is not None:
        out = out.filter(F.col("ts_last") - F.col("ts_first") <= within)
    return out.select(*keys, "start_id", "end_id", "ts_first", "ts_last")
