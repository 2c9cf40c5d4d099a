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
    quantifiers: str | Sequence[str] | None = None,
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

    ``quantifiers``: one of ``'1'`` (exactly one row — the default)
    or ``'+'`` (one or more contiguous rows, GREEDY-MAXIMAL) per
    step, as a string like ``"1+1"`` or a sequence. Kleene-plus is
    strict-mode only (SASE ``SEQ(A, B+, C)`` under contiguity): a
    ``+`` step consumes the maximal run of rows satisfying its
    predicate, and the NEXT step binds at the first row where that
    predicate fails (even if it would also satisfy the next step
    earlier — greedy is what makes the match deterministic and the
    output linear in starts, where all-sub-runs semantics is
    quadratic in run length). A final ``+`` step's run may end at the
    partition end. ``within`` filters the greedy match's span; it
    does not backtrack to a shorter sub-run. Emits ``end_id`` of the
    greedy match; overlapping starts each emit their own match.
    Plan: the per-+-step run boundary is "first ¬p at-or-after" — a
    running min over (currentRow, unboundedFollowing) in the SAME
    keyed window as the flags — then the same (key, id) equi-join
    chain as skip mode, one join per step after the first.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    k = len(steps)
    if k < 2:
        raise ValueError("a sequence pattern needs at least 2 steps")
    if within is not None and ts_col is None:
        raise ValueError("within requires ts_col")
    if mode not in ("strict", "skip"):
        raise ValueError(f"unknown mode {mode!r}: expected 'strict' or 'skip'")
    quant = _normalize_quantifiers(quantifiers, k)
    if "+" in quant:
        if mode != "strict":
            raise ValueError(
                "Kleene-plus quantifiers are strict-mode only: a greedy "
                "run is defined by contiguity; combine mode='skip' with "
                "quantifiers='1'*k instead"
            )
        return _match_events_kleene(df, keys, id_col, steps, quant, ts_col, within)
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


def _normalize_quantifiers(
    quantifiers: str | Sequence[str] | None, k: int
) -> list[str]:
    """Validate per-step quantifiers; default = all '1' (exactly one)."""
    if quantifiers is None:
        return ["1"] * k
    quant = list(quantifiers)
    if len(quant) != k:
        raise ValueError(
            f"quantifiers must have one entry per step: got {len(quant)} "
            f"for {k} steps"
        )
    bad = [q for q in quant if q not in ("1", "+")]
    if bad:
        raise ValueError(f"unknown quantifier(s) {bad!r}: expected '1' or '+'")
    return quant


def _match_events_kleene(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    steps: Sequence[Column],
    quant: list[str],
    ts_col: str | None,
    within: int | None,
) -> DataFrame:
    """Strict-contiguity SEQ with greedy-maximal Kleene-plus steps.

    Per row, ``_cont`` = this row's id is the previous row's id + 1
    (lag over the keyed window) — the contiguity bit; an id gap breaks
    runs exactly like it unmatches fixed-k patterns. Per + step j the
    run STOP for a row is the first LATER row where the predicate
    fails OR contiguity breaks: a running min over (currentRow,
    unboundedFollowing) of ``struct(id, prev_id)`` on stop rows (the
    struct compares on id and carries the preceding row's id — the
    run's true last id, correct across gaps), shifted back one row
    with lead(). All of it lives in the SAME keyed Window as the
    flags. A null stop means the run reaches the partition end
    (end = max id; only a FINAL + step may use it). The binding chain
    is the same (key, id) equi-join ladder as skip mode: one join per
    step after the first, each start matching exactly one row per
    join — O(starts × k), never a per-span product."""
    k = len(steps)
    idl = F.col(id_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(id_col)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    base = df
    for j, s in enumerate(steps):
        base = base.withColumn(
            f"_s{j}", F.coalesce(s.cast("boolean"), F.lit(False))
        )
    base = base.withColumn("_previd", F.lag(idl).over(w)).withColumn(
        "_cont", F.coalesce(F.col("_previd") == idl - 1, F.lit(False))
    )
    for j in range(k):
        if quant[j] == "+":
            stop = F.min(
                F.when(
                    ~F.col(f"_s{j}") | ~F.col("_cont"),
                    F.struct(idl.alias("sid"), F.col("_previd").alias("pid")),
                )
            ).over(fwd)
            base = base.withColumn(f"_stop{j}", F.lead(stop, 1).over(w))
    if quant[-1] == "+":
        # a final + run may end at the partition end
        base = base.withColumn(
            "_maxid", F.max(idl).over(Window.partitionBy(*keys))
        )

    def _next_b(j: int) -> Column:
        """Position where step j+1 binds, evaluated on step j's row."""
        if quant[j] == "1":
            return idl + 1
        # stop row id; null ⇒ run hits partition end: no row to bind.
        # A stop caused by a GAP is killed at the next binding (its
        # rhs requires _cont).
        return F.col(f"_stop{j}.sid")

    def _end_id(j: int) -> Column:
        """end_id of the match, evaluated on the FINAL step's row."""
        if quant[j] == "1":
            return idl
        return F.coalesce(F.col(f"_stop{j}.pid"), F.col("_maxid"))

    sel_ts = [F.col(ts_col).cast("long").alias("ts_first")] if ts_col else []
    cur = base.filter("_s0").select(
        *keys,
        idl.alias("start_id"),
        *sel_ts,
        _next_b(0).alias("_b"),
    )

    def _chain(lhs: DataFrame, rhs: DataFrame, keep: list[Column | str]) -> DataFrame:
        rhs = rhs.withColumnsRenamed({kk: f"_r_{kk}" for kk in keys})
        cond = lhs["_b"] == rhs["_rid"]
        for kk in keys:
            cond = cond & (lhs[kk] == rhs[f"_r_{kk}"])
        return lhs.join(rhs, cond, "inner").select(*keep)

    ts_keep = ["ts_first"] if ts_col else []
    for j in range(1, k - 1):
        # _cont: binding after a '1' step is contiguous by id
        # arithmetic; after a '+' step it rejects gap-terminated runs
        rhs = base.filter(F.col(f"_s{j}") & F.col("_cont")).select(
            *keys,
            idl.alias("_rid"),
            _next_b(j).alias("_bn"),
        )
        cur = _chain(
            cur, rhs,
            [*keys, "start_id", *ts_keep, F.col("_bn").alias("_b")],
        ).filter(F.col("_b").isNotNull())
    # final step: bind and resolve end_id on its row
    rhs = base.filter(F.col(f"_s{k - 1}") & F.col("_cont")).select(
        *keys,
        idl.alias("_rid"),
        _end_id(k - 1).alias("_eid"),
    )
    cur = _chain(
        cur, rhs,
        [*keys, "start_id", *ts_keep, F.col("_eid").alias("end_id")],
    )
    if ts_col is None:
        return cur.select(*keys, "start_id", "end_id")
    # ts_last lives on the end row — one more (key, id) join
    rhs = base.select(
        *keys,
        F.col(id_col).cast("long").alias("_rid"),
        F.col(ts_col).cast("long").alias("ts_last"),
    )
    cur = cur.withColumn("_b", F.col("end_id"))
    out = _chain(
        cur, rhs,
        [*keys, "start_id", "end_id", "ts_first", "ts_last"],
    )
    if within is not None:
        out = out.filter(F.col("ts_last") - F.col("ts_first") <= within)
    return out.select(*keys, "start_id", "end_id", "ts_first", "ts_last")


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
