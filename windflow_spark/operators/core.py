"""Basic (non-windowed) operators: Map, Filter, FlatMap, Accumulator, keyBy.

Reference semantics (WindFlow, /root/reference):
- Map: 1→1 transform, in-place or non-in-place (includes/map.hpp:59-68)
- Filter: drop tuples failing a predicate (includes/filter.hpp:58-63, 127-132)
- FlatMap: 1→0..N via a Shipper handle (includes/flatmap.hpp:60-65, 111-137)
- Accumulator: keyed rolling reduce — emits the running value after EVERY
  input tuple (includes/accumulator.hpp:101-106, emit at :181)
- keyBy routing: key→replica hash routing (includes/standard.hpp:62-84)

Spark-first design: each operator is a DataFrame→DataFrame combinator.
Stateless ops are plain Catalyst expressions (whole-stage codegen, no
Python in the hot path); vectorized pandas-UDF variants exist for UDF
logic that native expressions can't express. The Accumulator is a
running window aggregate (no per-row Python, no driver loop), which at
cluster scale is a single shuffle by key + in-partition sort.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


ColumnLike = Column | str


def map_(df: DataFrame, **cols: ColumnLike) -> DataFrame:
    """Map operator: 1→1 transform expressed as column (re)definitions.

    ``map_(df, text=F.upper("text"), n=F.length("text"))`` mirrors the
    reference's in-place Map (includes/map.hpp:59-63): existing columns
    are replaced, new ones appended. Stays entirely JVM-side.
    """
    return df.withColumns({k: F.expr(v) if isinstance(v, str) else v for k, v in cols.items()})


def map_pandas(df: DataFrame, fn: Callable, schema) -> DataFrame:
    """Map/transform via an Arrow-batched pandas UDF over whole partitions.

    ``fn(iter_of_pandas) -> iter_of_pandas`` (mapInPandas contract). Use
    only when native expressions can't express the transform; batch
    granularity is the Arrow batch, never per-row Python.
    """
    return df.mapInPandas(fn, schema=schema)


class RuntimeContext:
    """The reference's RuntimeContext surface (includes/context.hpp:45-82)
    for "rich" UDF variants: which replica am I, how many replicas run
    this operator, plus Spark stage/attempt identity for logging.

    ``num_replicas`` is what the caller declared (Spark's Python
    TaskContext does not expose partition count); -1 when unknown.
    As in the reference, anything computed from the replica index is
    inherently partitioning-dependent — use for sharded resources
    (per-replica RNG streams, connection pools, local caches), never
    for data semantics."""

    __slots__ = ("replica_index", "num_replicas", "stage_id", "attempt_number")

    def __init__(self, replica_index: int, num_replicas: int,
                 stage_id: int, attempt_number: int):
        self.replica_index = replica_index
        self.num_replicas = num_replicas
        self.stage_id = stage_id
        self.attempt_number = attempt_number


def map_pandas_rich(
    df: DataFrame, fn: Callable, schema, num_replicas: int | None = None
) -> DataFrame:
    """"Rich" Map/FlatMap (builders.hpp "rich" overloads +
    includes/context.hpp:45-82): ``fn(ctx, iter_of_pandas) ->
    iter_of_pandas`` where ``ctx`` is a :class:`RuntimeContext` bound to
    the executing task — replica_index = the task's partition id, the
    Spark analogue of the reference's replica index. Arrow-batched like
    map_pandas; combine with :func:`key_by` to pin the replica count."""

    def run(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        ctx = RuntimeContext(
            tc.partitionId() if tc else 0,
            num_replicas if num_replicas is not None else -1,
            tc.stageId() if tc else -1,
            tc.attemptNumber() if tc else 0,
        )
        yield from fn(ctx, batches)

    return df.mapInPandas(run, schema)


def filter_(df: DataFrame, predicate: ColumnLike) -> DataFrame:
    """Filter operator: keep rows where predicate holds.

    Mirrors includes/filter.hpp:127-132 (drop on false). Native Catalyst
    predicate → parquet pushdown when applied at the scan.
    """
    return df.filter(F.expr(predicate) if isinstance(predicate, str) else predicate)


def flat_map(df: DataFrame, emit: ColumnLike, alias: str, keep: Sequence[str] | None = None) -> DataFrame:
    """FlatMap operator: 1→0..N rows.

    ``emit`` is an array-valued expression; each element becomes one
    output row (empty array ⇒ 0 rows — the Shipper-with-no-emissions
    case, includes/shipper.hpp:63-77). Equivalent to the reference's
    FlatMap UDF shipping 0..N results per input (includes/flatmap.hpp:111-137),
    but stays in codegen via explode().
    """
    emit_col = F.expr(emit) if isinstance(emit, str) else emit
    keep_cols = [F.col(c) for c in (keep if keep is not None else df.columns)]
    return df.select(*keep_cols, F.explode(emit_col).alias(alias))


def key_by(
    df: DataFrame,
    *keys: str,
    num_partitions: int | None = None,
    routing: ColumnLike | None = None,
) -> DataFrame:
    """keyBy routing: hash-partition the stream by key columns.

    Mirrors includes/standard.hpp:62-84 (``routing(k,n)=hash(k)%n``).
    In Spark an explicit repartition is only needed to force key
    co-location for stateful pandas kernels; groupBy inserts its own
    exchange otherwise. Exposed for plan control (Key_Farm analogue).

    ``routing`` — optional custom routing expression (the reference's
    pluggable ``routing_func_t``, includes/builders.hpp:190): the
    partitioner hashes this expression instead of the raw keys, e.g. a
    salt (``F.concat("k", F.pmod(F.col("id"), F.lit(4)))``) to split a
    hot key, or a coarser bucket to co-locate related keys. All rows
    with equal routing values land in one partition; downstream
    key-level groupBys still insert their own exchange when the routing
    is coarser/finer than the key.
    """
    if routing is not None:
        r = F.expr(routing) if isinstance(routing, str) else routing
        cols = [r]
    else:
        cols = [F.col(k) for k in keys]
    return df.repartition(num_partitions, *cols) if num_partitions else df.repartition(*cols)


def drop_regressions(
    df: DataFrame,
    keys: Sequence[str],
    order_col: ColumnLike,
    arrival_by: Sequence[ColumnLike],
) -> DataFrame:
    """Batch out-of-order drop rule: the reference discards any tuple
    whose ts/id does not advance past the last one processed for its key
    (includes/win_seq.hpp:289-305, wf_nodes.hpp:104-121 — same rule the
    streaming path applies as ``stream_cb_windows(on_late="drop")``).

    ``arrival_by`` defines the per-key arrival order (the sequence the
    reference's single-threaded replica would consume); ``order_col`` is
    the monotonicity subject (event ts or CB id). A row survives iff its
    ``order_col`` is strictly greater than every earlier arrival's — so
    regressions AND duplicates drop, exactly the streaming "drop"
    policy's ``id > last_id`` test.

    Physical plan: one shuffle on ``keys`` + in-partition sort + a
    running-max window (no per-row Python) — the batch analogue costs
    one exchange, same as any keyed stateful pass.
    """
    ord_c = F.expr(order_col) if isinstance(order_col, str) else order_col
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*[F.expr(o) if isinstance(o, str) else o for o in arrival_by])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(ord_c).over(w)
    # collision-safe temp name: an input that already carries the temp
    # column must not be overwritten-then-dropped
    tmp = "_prev_max"
    while tmp in df.columns:
        tmp += "_"
    return (
        df.withColumn(tmp, prev_max)
        .filter(F.col(tmp).isNull() | (ord_c > F.col(tmp)))
        .drop(tmp)
    )


def accumulate(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[ColumnLike],
    aggs: dict[str, Column],
) -> DataFrame:
    """Accumulator: keyed rolling reduce emitting the running value after
    every input tuple (includes/accumulator.hpp:157-192, emit at :181).

    ``aggs`` maps output column name → aggregate Column (e.g.
    ``{"running_sum": F.sum("value")}``); each is evaluated over the
    growing per-key prefix ordered by ``order_by``. One output row per
    input row. Physical plan: one shuffle on ``keys`` + in-partition
    sort + running aggregate — scales as a single exchange.
    """
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*[F.expr(o) if isinstance(o, str) else o for o in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumns({name: agg.over(w) for name, agg in aggs.items()})
