"""Structured Streaming plans for the engine (SURVEY.md §7 P4).

Same plan shapes as the batch operators, over ``readStream``:
- TB windows → watermarked windowed hash-aggregate
  (StateStoreSave; RocksDB provider at scale — session.get_spark(streaming=True));
- session windows → native ``F.session_window`` (state-store session merge);
- CB (count-based) windows → ``applyInPandasWithState`` keyed stateful
  processor (Spark has no native count windows): per-key state carries
  the running tuple count and open-window partials; windows fire when
  their last tuple arrives, mirroring Triggerer_CB
  (reference includes/window.hpp:49-67);
- stream-stream correlation join → watermarked interval equi-join
  (StreamingSymmetricHashJoin);
- exactly-once sink → file/parquet sink with checkpointed manifest;
  ``availableNow`` trigger drains the backlog and stops; the EOS flush
  of includes/win_seq.hpp:432-474 (partial windows emitted when the
  stream ends) is ``flush_cb_partials`` — a state-store data-source
  read over the drain's checkpoint that finalizes the still-open
  windows the processor left in state.

Watermark semantics vs the reference: the reference DROPS any per-key
ts regression (includes/win_seq.hpp:289-305); Spark drops only below
the watermark. Parity holds on inputs in stable (key, ts) order —
tests feed per-key-ordered input (SURVEY.md §4.2 gap note).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from windflow_spark.operators.windows import GWID, WinSpec, floordiv


def stream_source(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source over a parquet directory (the local stand-in
    for an Iceberg streaming read; same plan downstream). Rate limiting
    via maxFilesPerTrigger = backpressure (reference bounded queues,
    SURVEY.md §4.2)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _as_ts(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP; parquet scans yield TIMESTAMP_NTZ.
    Session tz is pinned UTC (session.get_spark) so the cast is a
    reinterpretation, consistent with epoch_us on the batch path."""
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def stream_exact_dedup(
    df: DataFrame,
    text_col: str,
    ts_col: str | None = None,
    watermark: str | None = None,
    digest_col: str = "digest",
    keeper_id: str | None = None,
) -> DataFrame:
    """Streaming exact dedup for continuous corpus ingestion: one row
    per first-seen content digest, across micro-batches (the streaming
    arm of functions/dedup.exact_dedup — same md5 digest key).

    State = one entry per DISTINCT digest (32-byte key + bookkeeping),
    bounded by distinct content, not stream length — the right shape
    for an append-heavy 100 TB feed where most arrivals are dupes.
    With ``ts_col`` + ``watermark``, uses dropDuplicatesWithinWatermark
    so digest state expires past the lateness bound: the unbounded-
    retention global mode is then handled by a periodic batch
    compaction (dedup.exact_dedup over the sink), which is how a
    production pipeline bounds streaming state.

    Which arrival survives per digest: with ``keeper_id`` set (any
    orderable column, e.g. the doc id), the survivor is the MIN
    keeper_id among the digest's rows in the FIRST micro-batch that
    carries it — exact_dedup's min-id rule applied per batch, so the
    output is deterministic for a fixed batch assignment and fully
    deterministic whenever a digest's first appearance lands whole in
    one batch (VERDICT r6 #6). Implemented as an
    applyInPandasWithState min-reduce keyed by digest (the grouping
    shuffles the same full rows dropDuplicates would; state is the
    same one-entry-per-distinct-digest seen marker). Without
    ``keeper_id`` the survivor is arrival-order-dependent
    (dropDuplicates semantics); the watermark arm keeps that mode —
    bounded retention and a deterministic keeper compose by re-keying
    downstream instead."""
    out = df.withColumn(digest_col, F.md5(F.col(text_col)))
    if watermark is not None:
        if ts_col is None:
            raise ValueError("watermark requires ts_col")
        if keeper_id is not None:
            raise ValueError(
                "keeper_id is only supported in the unbounded-retention "
                "mode; with a watermark, re-key downstream"
            )
        out = _as_ts(out, ts_col).withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark([digest_col])
    if keeper_id is None:
        return out.dropDuplicates([digest_col])

    import pandas as pd  # local: the hot path below is Arrow-batched

    out_schema = out.schema
    id_name = keeper_id

    def _keep_first(key, pdfs, state):
        if state.exists:
            for _ in pdfs:  # drain; digest already emitted
                pass
            return
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            # sort_values, not nsmallest: nsmallest raises TypeError on
            # non-numeric dtypes, but keeper_id may be ANY orderable
            # column, e.g. a string doc id (ADVICE r7 #1)
            cand = pdf.sort_values(id_name, kind="stable").head(1)
            best = (
                cand
                if best is None
                else pd.concat([best, cand])
                .sort_values(id_name, kind="stable")
                .head(1)
            )
        if best is not None:
            state.update((1,))
            yield best

    return out.groupBy(digest_col).applyInPandasWithState(
        _keep_first,
        outputStructType=out_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def stream_win_tb(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    spec: WinSpec,
    aggs: dict[str, Column],
    watermark: str = "1 hour",
    unit: str = "second",
) -> DataFrame:
    """Watermarked TB windowed aggregate; gwid recovered from the window
    start for row parity with the batch plan.

    Hopping windows (win < slide) can't be expressed by ``F.window``
    (it requires slide ≤ win), so they route through the
    tumbling-of-slide trick: hopping windows are disjoint, every event
    belongs to at most one (gwid = t//slide, kept iff t%slide < win),
    so a pre-filter plus a ``slide``-long tumbling window gives the
    identical grouping — same plan shape, one stateful aggregate
    (the derived-gwid analogue of the batch assign_wids hopping path,
    includes/win_seq.hpp:326-338)."""
    micros_per = {"microsecond": 1, "millisecond": 1_000, "second": 1_000_000}[unit]
    src = _as_ts(df, ts_col)
    if spec.win < spec.slide:  # hopping: gap rows discarded up front
        src = src.filter(
            F.unix_micros(F.col(ts_col)) % F.lit(spec.slide * micros_per)
            < F.lit(spec.win * micros_per)
        )
        win_dur = spec.slide
    else:
        win_dur = spec.win
    out = (
        src.withWatermark(ts_col, watermark)
        .groupBy(
            *[F.col(k) for k in keys],
            F.window(F.col(ts_col), f"{win_dur} {unit}", f"{spec.slide} {unit}").alias("w"),
        )
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    return out.withColumn(
        GWID,
        floordiv(F.unix_micros(F.col("w.start")), spec.slide * micros_per),
    ).drop("w")


def stream_win_tb_nic(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    spec: WinSpec,
    nic_fn,
    out_fields: str,
    payload_cols: Sequence[str],
    watermark: str = "1 hour",
    unit: str = "second",
) -> DataFrame:
    """Streaming NIC (whole-window UDF) TB windows — the streaming
    analogue of the reference's fire-and-compute over the window
    archive (includes/win_seq.hpp:355-392).

    Spark-first shape: the archive IS a watermarked windowed
    ``collect_list(struct(...))`` aggregate — the state store plays the
    StreamArchive (includes/stream_archive.hpp), append mode fires when
    the watermark passes the window end (EOS-equivalent close), and the
    whole-window pandas UDF runs over each fired window's full content.
    No custom stateful processor needed; RocksDB-backed like every
    other windowed aggregate.

    ``nic_fn(pdf) -> dict`` — receives the window rows as a pandas
    DataFrame (columns ``payload_cols`` + ``_ts_us``, sorted by
    ``_ts_us``; tie order among equal timestamps is not defined, so the
    fn must be tie-insensitive — same contract as the batch NIC path).
    Returns one dict per window matching ``out_fields`` (a DDL string,
    e.g. ``"median_value double, cnt long"``); emit multi-row results
    (e.g. a skyline) as an array field and explode downstream."""
    from pyspark.sql.types import StructType

    names = StructType.fromDDL(out_fields).names

    @F.pandas_udf(out_fields)
    def _nic(arch: pd.Series) -> pd.DataFrame:
        recs = []
        for rows in arch:
            pdf = pd.DataFrame(list(rows)).sort_values("_ts_us", kind="stable")
            recs.append(nic_fn(pdf))
        return pd.DataFrame(recs, columns=names)

    archive = F.collect_list(
        F.struct(
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
            *[F.col(c) for c in payload_cols],
        )
    )
    agg = stream_win_tb(
        df, keys, ts_col, spec, {"_arch": archive}, watermark=watermark, unit=unit
    )
    return agg.withColumn("_res", _nic(F.col("_arch"))).select(
        *keys, GWID, "_res.*"
    )


def stream_session(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: str,
    aggs: dict[str, Column],
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows via native session_window (state-store merge)."""
    out = (
        _as_ts(df, ts_col).withWatermark(ts_col, watermark)
        .groupBy(
            *[F.col(k) for k in keys],
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    return out.withColumn("session_start", F.unix_micros("w.start")).withColumn(
        "session_end_excl", F.unix_micros("w.end")
    ).drop("w")


# Decomposable (INC) fold ops for streaming CB windows: per-window
# partial slots + numpy batch kernel + cross-batch merge + finalize.
# The reference accepts an arbitrary INC lambda (includes/win_seq.hpp:
# 63-65); a distributed engine needs the fold DECLARED decomposable, so
# the op registry is the contract (sum/count/min/max/mean cover the
# reference's test programs; argmax proves the registry generalizes
# beyond scalar semigroups, var/std beyond two slots). Users extend it
# with register_cb_op(), which property-checks the declared fold for
# decomposability before admitting it.


def _argmax_batch(g, c):
    """Per-window argmax partials: (max value, id attaining it) with
    smallest-id tiebreak. Vectorized via a (value DESC, id ASC) sort +
    groupby-first over the fold frame (``g.obj`` — the frame always
    carries the per-key monotone id as ``_id``)."""
    df = g.obj.sort_values([c, "_id"], ascending=[False, True], kind="stable")
    f = df.groupby("_w", sort=True).first()
    return [f[c], f["_id"].astype("float64")]


def _argmax_merge(o, n):
    # old partials hold strictly smaller ids (per-key ids are monotone
    # across batches), so a value tie keeps the old (smaller-id) slot
    return list(n) if n[0] > o[0] or (n[0] == o[0] and n[1] < o[1]) else list(o)


def _var_batch(g, c):
    """(sum, sum-of-squares, count) partials — the three-slot
    decomposable triple behind var/std (population variance via the
    E[x²]−E[x]² identity; merge is slot-wise addition)."""
    sq = g.obj.assign(_sq=g.obj[c] * g.obj[c]).groupby("_w", sort=True)["_sq"].sum()
    return [g[c].sum(), sq, g.size().astype("float64")]


def _var_merge(o, n):
    return [o[0] + n[0], o[1] + n[1], o[2] + n[2]]


def _var_final(s):
    # clamp: float cancellation on near-constant windows can land a
    # hair below 0, which would NaN the std sqrt
    return max(0.0, s[1] / s[2] - (s[0] / s[2]) ** 2)


def _var_cat(p, i):
    m = p[i] / p[i + 2]
    return F.greatest(F.lit(0.0), p[i + 1] / p[i + 2] - m * m)


# ---- hll64: mergeable approximate count-distinct --------------------
#
# A 64-register (p=6) HyperLogLog as a CB fold: registers ARE the
# partial slots, so the sketch merges across batches/splits with
# elementwise max — the textbook mergeable-sketch property, and the
# proof the fold registry accommodates non-arithmetic partials. The
# hash is the engine-wide PORTABLE md5 (never Spark hash()): the input
# column must be pre-mapped with ``hll_prep`` (Catalyst md5 → first 6
# hex chars as a 24-bit int, computed JVM-side so the Python kernel
# does no per-row hashing): high 8 bits mod 64 = bucket, low 16 bits =
# rank field, register = max(17 − bit_length(field)). Every estimate
# ingredient is deterministic and DuckDB-expressible — 2^−r terms are
# exact dyadics (sums are order-independent), the alpha·m² constant is
# ONE shared literal, the ≤ 2.5m small-range correction uses
# V = 64 − occupied buckets — so gate oracles recompute the IDENTICAL
# estimate (to the shared round(·, 4)) rather than asserting a bound.
_HLL_M = 64
_HLL_ALPHA_M2 = 2905.460551022604  # 0.7213 / (1 + 1.079/64) * 64**2
_HLL_LINEAR_MAX = 160.0  # 2.5 * m


def hll_prep(col) -> "F.Column":
    """Catalyst pre-hash for the ``hll64`` fold: first 6 hex chars of
    md5(value as string) as a 24-bit integer. Apply BEFORE the
    stateful operator; the value must render identically to the
    oracle's ``cast(x AS varchar)`` (integers/strings do; avoid raw
    floats)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 6), 16, 10).cast("long")


def _hll_batch(g, c):
    import numpy as np

    df = g.obj
    v = df[c].to_numpy(dtype=np.float64).astype(np.int64)  # ≤ 2^24: exact
    b = (v >> 16) & 63
    x = (v & 0xFFFF).astype(np.float64)
    # bit_length via frexp's exponent (exact for ints < 2^24); x == 0
    # keeps exponent 0 → register 17, the all-zero-tail convention
    rank = (17 - np.frexp(x)[1]).astype(np.float64)
    t = pd.DataFrame({"_w": df["_w"].to_numpy(), "_b": b, "_r": rank})
    mx = (
        t.groupby(["_w", "_b"], sort=True)["_r"]
        .max()
        .unstack("_b", fill_value=0.0)
        .reindex(columns=range(_HLL_M), fill_value=0.0)
        .reindex(index=g.size().index, fill_value=0.0)
    )
    return [mx[j] for j in range(_HLL_M)]


def _hll_merge(o, n):
    return [a if a >= b else b for a, b in zip(o, n)]


def _hll_final(s):
    import math

    S = sum(2.0 ** -r for r in s)  # exact dyadics: order-independent
    V = sum(1 for r in s if r == 0)
    e = _HLL_ALPHA_M2 / S
    if e <= _HLL_LINEAR_MAX and V > 0:
        e = float(_HLL_M) * math.log(float(_HLL_M) / V)
    return round(e, 4)


def _hll_cat(p, i):
    regs = F.slice(p, i + 1, _HLL_M)
    S = F.aggregate(
        regs, F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r)
    )
    V = F.size(F.filter(regs, lambda r: r == F.lit(0.0)))
    raw = F.lit(_HLL_ALPHA_M2) / S
    lin = F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / V.cast("double"))
    return F.round(
        F.when((raw <= F.lit(_HLL_LINEAR_MAX)) & (V > 0), lin).otherwise(raw), 4
    )


_CB_OPS = {
    # op: (n_slots,
    #      batch_kernel(frame_groupby, in_col) -> list of per-slot
    #          Series indexed by window id (the groupby frame carries
    #          the fold's value columns plus "_id" = the tuple id),
    #      merge(old_slots, new_slots), finalize(slots),
    #      out_sql_type,
    #      catalyst_finalize(parts_array_col, slot_pos) -> Column —
    #          the same finalize over the persisted slot layout, used
    #          by flush_cb_partials' pure-Catalyst EOS projection)
    # count uses size() (true row count, null-insensitive) — the
    # reference's per-row fold counts EVERY tuple; null/NaN values in
    # other ops' input columns are rejected at the operator boundary
    # (_make_cb_fold) rather than silently skipped, so pandas skipna
    # semantics can't diverge from the reference fold.
    "sum": (1, lambda g, c: [g[c].sum()], lambda o, n: [o[0] + n[0]],
            lambda s: s[0], "double", lambda p, i: p[i]),
    "count": (1, lambda g, c: [g.size().astype("float64")],
              lambda o, n: [o[0] + n[0]], lambda s: int(s[0]), "long",
              lambda p, i: p[i]),
    "min": (1, lambda g, c: [g[c].min()],
            lambda o, n: [min(o[0], n[0])], lambda s: s[0], "double",
            lambda p, i: p[i]),
    "max": (1, lambda g, c: [g[c].max()],
            lambda o, n: [max(o[0], n[0])], lambda s: s[0], "double",
            lambda p, i: p[i]),
    "mean": (2, lambda g, c: [g[c].sum(), g.size().astype("float64")],
             lambda o, n: [o[0] + n[0], o[1] + n[1]],
             lambda s: s[0] / s[1], "double",
             lambda p, i: p[i] / p[i + 1]),
    # argmax: the id of the tuple attaining the window max of in_col
    # (ties → smallest id; (value, id) slot pair — the max_by shape the
    # reference folds with an arbitrary INC lambda). Ids are exact in
    # the float64 slot up to 2^53.
    "argmax": (2, _argmax_batch, _argmax_merge,
               lambda s: int(s[1]), "long", lambda p, i: p[i + 1]),
    # var/std: POPULATION variance over the (sum, sumsq, count) slot
    # TRIPLE (VERDICT r5 #5 — exercises batch kernel, merge, Python
    # finalize and the Catalyst EOS finalizer across three slots).
    "var": (3, _var_batch, _var_merge, _var_final, "double", _var_cat),
    "std": (3, _var_batch, _var_merge,
            lambda s: _var_final(s) ** 0.5, "double",
            lambda p, i: F.sqrt(_var_cat(p, i))),
    # hll64: mergeable approx count-distinct — the registers are the
    # slots (merge = elementwise max); input column must be hll_prep'd
    "hll64": (_HLL_M, _hll_batch, _hll_merge, _hll_final, "double",
              _hll_cat),
}


def register_cb_op(
    name: str,
    *,
    n_slots: int,
    batch,
    merge,
    finalize,
    out_type: str = "double",
    catalyst=None,
    validate_with=None,
    tol: float = 1e-9,
) -> None:
    """Register a USER-DECLARED decomposable fold as a streaming CB op
    — closing the gap to the reference's arbitrary INC lambda
    (win_seq.hpp:63-65): any fold a user can state as (partial slots,
    batch kernel, merge, finalize) plugs into stream_cb_windows,
    stream_cb_windows_tws and the EOS flush arms exactly like the
    built-ins (they all read the same registry).

    - ``n_slots``: float64 partial slots per window.
    - ``batch(g, col)``: the per-Arrow-batch kernel — receives the
      fold frame's pandas groupby over window id ``_w`` (the frame
      carries the value columns plus ``_id`` = the tuple id) and
      returns a list of ``n_slots`` Series indexed by window id.
    - ``merge(old_slots, new_slots) -> slots``: cross-batch partial
      merge (lists of floats).
    - ``finalize(slots) -> value`` with SQL type ``out_type``.
    - ``catalyst(parts_col, slot_pos) -> Column`` (optional): the same
      finalize as a Catalyst expression over the persisted slot
      arrays. With it, the statestore EOS flush stays a pure scan +
      projection; without it, ``flush_cb_partials`` transparently
      routes through the mapInPandas arm (Python finalize over state
      rows — one row per key, no shuffle, still no replay).
    - ``validate_with`` (recommended): a 1-D float sample. The
      declaration is property-checked for DECOMPOSABILITY before
      registration: for every split point, merging the two halves'
      partials must equal folding the whole sample (the condition that
      makes the cross-batch merge correct — a non-decomposable kernel
      like an unmergeable median is rejected here instead of silently
      emitting wrong windows at runtime).
    """
    if name in _CB_OPS:
        raise ValueError(f"CB op {name!r} already registered")
    if validate_with is not None:
        import numpy as np

        sample = np.asarray(validate_with, dtype=np.float64)
        if sample.ndim != 1 or len(sample) < 2:
            raise ValueError("validate_with must be a 1-D sample with >= 2 values")

        def _partials(vals, ids):
            frame = pd.DataFrame(
                {"_w": np.zeros(len(vals), dtype=np.int64), "_id": ids,
                 "_v": vals}
            )
            out = batch(frame.groupby("_w", sort=True), "_v")
            if len(out) != n_slots:
                raise ValueError(
                    f"batch kernel returned {len(out)} slots, declared {n_slots}"
                )
            return [float(s.loc[0]) for s in out]

        ids = np.arange(len(sample), dtype=np.int64)
        whole = _partials(sample, ids)
        for k in range(1, len(sample)):
            merged = merge(_partials(sample[:k], ids[:k]),
                           _partials(sample[k:], ids[k:]))
            bad = [
                (i, m, w) for i, (m, w) in enumerate(zip(merged, whole))
                if not (abs(m - w) <= tol * max(1.0, abs(w)))
            ]
            if bad:
                raise ValueError(
                    f"CB op {name!r} is not decomposable: merging the "
                    f"split at {k} gives slots {merged} but folding the "
                    f"whole sample gives {whole} — the cross-batch merge "
                    "would emit wrong windows. Use an NIC whole-window "
                    "UDF (win_seq nic_fn) for exact non-decomposable "
                    "logic, or register_quantile_hist_op for a mergeable "
                    "approximate quantile."
                )
        finalize(whole)  # must at least run on real partials
    _CB_OPS[name] = (n_slots, batch, merge, finalize, out_type, catalyst)


def register_quantile_hist_op(
    name: str,
    lo: float,
    hi: float,
    bins: int = 64,
    q: float = 0.5,
) -> dict:
    """Register a MERGEABLE approximate quantile as a CB fold: a
    fixed-range equi-width histogram whose bucket counts are the
    partial slots (merge = elementwise ADD — the decomposable sketch
    that a raw median is not; ``register_cb_op`` rejects the latter at
    registration, this is the declared alternative it points to).
    Error bound: one bucket width (hi − lo)/bins — the caller chooses
    the precision/state tradeoff. Values outside [lo, hi) clamp into
    the edge buckets (documented semantics, mirrored by oracles).

    finalize: lower-interpolated quantile — target rank = q·n; walk
    the cumulative counts to the first non-empty bucket reaching it
    and interpolate inside: lo + w·(bucket + (target − cum_before)/c),
    rounded to 4 dp. Every ingredient is exact-integer counts plus
    identically-ordered float arithmetic over SHARED literals (w is
    Python-evaluated once), so a DuckDB oracle recomputes the
    identical value. No Catalyst finalizer is declared — the EOS flush
    transparently routes these partials through the mapInPandas arm
    (the register_cb_op fallback path).

    Returns the literals dict {lo, hi, bins, w, q} so gates/oracles
    embed the exact same floats."""
    import numpy as np

    lo_, hi_, q_ = float(lo), float(hi), float(q)
    if not (hi_ > lo_ and bins >= 2 and 0.0 < q_ < 1.0):
        raise ValueError("need hi > lo, bins >= 2, 0 < q < 1")
    w = (hi_ - lo_) / bins

    def batch(g, c):
        df = g.obj
        v = df[c].to_numpy(dtype=np.float64)
        b = np.clip(np.floor((v - lo_) / w), 0, bins - 1).astype(np.int64)
        t = pd.DataFrame({"_w": df["_w"].to_numpy(), "_b": b})
        mx = (
            t.groupby(["_w", "_b"], sort=True)
            .size()
            .astype("float64")
            .unstack("_b", fill_value=0.0)
            .reindex(columns=range(bins), fill_value=0.0)
            .reindex(index=g.size().index, fill_value=0.0)
        )
        return [mx[j] for j in range(bins)]

    def merge(o, n):
        return [a + b for a, b in zip(o, n)]

    def finalize(s):
        total = sum(s)
        target = q_ * total
        cum = 0.0
        for i, c in enumerate(s):
            if c > 0 and cum + c >= target:
                return round(lo_ + w * (i + (target - cum) / c), 4)
            cum += c
        return round(hi_, 4)

    register_cb_op(
        name,
        n_slots=bins,
        batch=batch,
        merge=merge,
        finalize=finalize,
        out_type="double",
        validate_with=[lo_ + (hi_ - lo_) * f for f in
                       (0.05, 0.2, 0.2, 0.45, 0.6, 0.8, 0.95)],
    )
    return {"lo": lo_, "hi": hi_, "bins": bins, "w": w, "q": q_}


def _make_cb_fold(win: int, slide: int, aggs: dict, in_cols: list[str]):
    """Build the vectorized CB fold kernel shared by stream_cb_windows
    (applyInPandasWithState) and stream_cb_windows_tws
    (transformWithStateInPandas): fold sorted ids into open windows,
    return fired (gwid, finalized..., win_end) rows. Fully vectorized —
    the wid explosion is arange arithmetic, partials one pandas groupby.

    Columns feeding a non-count fold must be null/NaN-free: a NaN would
    silently vanish under pandas skipna while the reference's per-row
    fold propagates it, so the kernel raises instead."""
    import numpy as np

    strict_cols = sorted(
        {c for op, c in aggs.values() if c is not None and op != "count"}
    )

    def _fold(ids: "np.ndarray", vals: dict, open_w: dict) -> list:
        for c in strict_cols:
            if np.isnan(vals[c]).any():
                raise ValueError(
                    f"null/NaN in CB fold input column {c!r} — the "
                    "decomposable fold requires non-null values "
                    "(filter or fillna upstream)"
                )
        last = ids // slide
        first = np.maximum(0, (ids - win) // slide + 1)
        # hopping (win < slide): ids in a gap have last < first — an
        # empty wid range (includes/win_seq.hpp:326-338), clip to 0
        counts = np.maximum(0, last - first + 1).astype(np.int64)
        total = int(counts.sum())
        row_idx = np.repeat(np.arange(len(ids)), counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        wid = first[row_idx] + offs
        # the frame always carries the tuple id (_id) so order-aware
        # ops (argmax) can reach it; kernels receive the frame groupby
        frame = {"_w": wid, "_id": ids[row_idx]}
        for c in in_cols:
            frame[c] = vals[c][row_idx]
        g = pd.DataFrame(frame).groupby("_w", sort=True)
        slot_series = []
        for op, c in aggs.values():
            slot_series += _CB_OPS[op][1](g, c)
        wkeys = slot_series[0].index.to_numpy()
        mat = np.column_stack([s.to_numpy() for s in slot_series])
        for w, new in zip(wkeys, mat):
            old = open_w.get(int(w))
            if old is None:
                open_w[int(w)] = list(new)
            else:
                merged, pos = [], 0
                for op, _c in aggs.values():
                    ns = _CB_OPS[op][0]
                    merged += _CB_OPS[op][2](old[pos:pos + ns], list(new[pos:pos + ns]))
                    pos += ns
                open_w[int(w)] = merged
        # Triggerer_CB: fire windows whose last tuple is in this span
        fired = []
        f_mask = (ids - win + 1 >= 0) & ((ids - win + 1) % slide == 0)
        for w in ((ids[f_mask] - win + 1) // slide).tolist():
            part = open_w.pop(w, None)
            if part is None:
                continue
            outs, pos = [], 0
            for op, _c in aggs.values():
                ns = _CB_OPS[op][0]
                outs.append(_CB_OPS[op][3](part[pos:pos + ns]))
                pos += ns
            fired.append((w, *outs, w * slide + win - 1))
        return fired

    return _fold


def stream_cb_windows(
    df: DataFrame,
    key: str,
    id_col: str,
    value_col: str | None,
    spec: WinSpec,
    on_late: str = "drop",
    aggs: dict[str, tuple[str, str | None]] | None = None,
    lateness: int = 0,
) -> DataFrame:
    """Count-based windows in streaming: keyed stateful processor via
    applyInPandasWithState, numpy-vectorized per Arrow batch.

    A tuple with per-key monotone id ``i`` belongs to wids
    [max(0, floor((i-win)/slide)+1), floor(i/slide)]; window w fires
    (is emitted) when its last tuple (id == w*slide+win-1) arrives —
    Triggerer_CB (includes/window.hpp:49-67). Partial windows remain in
    state; after a drain, ``flush_cb_partials`` reads them back from
    the checkpoint and emits them (the reference's eosnotify flush,
    win_seq.hpp:432-474 — batch mode gets the same flush for free).

    ``aggs`` — {out_col: (op, in_col)} with op from sum/count/min/max/
    mean/argmax/var/std (the decomposable-fold registry ``_CB_OPS``;
    the streaming analogue of the reference's arbitrary INC lambda,
    win_seq.hpp:63-65).
    Defaults to the classic {"sum_value": ("sum", value_col),
    "cnt": ("count", None)} shape.

    ``on_late`` — cross-batch out-of-order policy:
    - "drop" (default): REFERENCE PARITY — any id ≤ the last processed
      id for the key is discarded, exactly the reference's out-of-order
      drop rule (includes/win_seq.hpp:289-305, wf_nodes.hpp:104-121).
    - "buffer": hold rows in state and only fold ids ≤ (max id seen −
      ``lateness``), re-sorting the buffered span — reproduces the
      fully-ordered result for any disorder within the bound (ids
      beyond it still drop). Windows in the trailing ``lateness`` span
      stay buffered until later data arrives (the CB analogue of a
      watermark delay).
    - "assume_ordered": trust per-key arrival order across batches
      (single-writer sources); cheapest, silently wrong under disorder.
    Within a batch, rows are always processed in id order.
    """
    if on_late not in ("assume_ordered", "drop", "buffer"):
        raise ValueError(f"unknown on_late policy {on_late!r}")
    if aggs is None:
        if value_col is None:
            raise ValueError("value_col or aggs required")
        aggs = {"sum_value": ("sum", value_col), "cnt": ("count", None)}
    for name, (op, _c) in aggs.items():
        if op not in _CB_OPS:
            raise ValueError(f"agg {name!r}: unknown op {op!r} (have {sorted(_CB_OPS)})")
    import numpy as np

    win, slide = spec.win, spec.slide
    # input columns feeding any fold (count-with-None folds over ids)
    in_cols = sorted({c for _, c in aggs.values() if c is not None})
    out_cols = ", ".join(
        f"{n} {_CB_OPS[op][4]}" for n, (op, _c) in aggs.items()
    )
    out_schema = f"{key} string, gwid long, {out_cols}, win_end long"
    state_schema = (
        "wids array<long>, parts array<array<double>>, last_id long, "
        "buf_ids array<long>, buf_vals array<array<double>>"
    )
    _fold = _make_cb_fold(win, slide, aggs, in_cols)

    def proc(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            wids, parts, last_id, buf_ids, buf_vals = state.get
            open_w = {w: list(p) for w, p in zip(wids, parts)}
            buf_i = np.asarray(buf_ids, dtype=np.int64)
            buf_v = {c: np.asarray(v, dtype=np.float64)
                     for c, v in zip(in_cols, buf_vals)}
        else:
            open_w, last_id = {}, -1
            buf_i = np.empty(0, dtype=np.int64)
            buf_v = {c: np.empty(0) for c in in_cols}
        fired = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            vals = {c: pdf[c].to_numpy(dtype=np.float64) for c in in_cols}
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            vals = {c: v[order] for c, v in vals.items()}
            if on_late == "buffer":
                buf_i = np.concatenate([buf_i, ids])
                buf_v = {c: np.concatenate([buf_v[c], vals[c]]) for c in in_cols}
                thresh = int(buf_i.max()) - lateness
                order = np.argsort(buf_i, kind="stable")
                buf_i = buf_i[order]
                buf_v = {c: v[order] for c, v in buf_v.items()}
                ripe = buf_i <= thresh
                ids = buf_i[ripe]
                vals = {c: v[ripe] for c, v in buf_v.items()}
                buf_i = buf_i[~ripe]
                buf_v = {c: v[~ripe] for c, v in buf_v.items()}
            if on_late in ("drop", "buffer"):
                keep = ids > last_id
                ids, vals = ids[keep], {c: v[keep] for c, v in vals.items()}
                if len(ids):
                    # drop within-span duplicates (first occurrence wins)
                    uniq = np.concatenate([[True], ids[1:] != ids[:-1]])
                    ids = ids[uniq]
                    vals = {c: v[uniq] for c, v in vals.items()}
                    last_id = int(ids[-1])
            if len(ids):
                fired += _fold(ids, vals, open_w)
        items = sorted(open_w.items())
        state.update(
            (
                [w for w, _ in items],
                [list(map(float, p)) for _, p in items],
                last_id,
                buf_i.tolist(),
                [buf_v[c].tolist() for c in in_cols],
            )
        )
        if fired:
            yield pd.DataFrame(
                [(k[0], *row) for row in sorted(fired)],
                columns=[key, "gwid", *aggs.keys(), "win_end"],
            )

    return (
        df.groupBy(key)
        .applyInPandasWithState(
            proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def stream_match_events(
    df: DataFrame,
    key: str,
    id_col: str,
    steps: Sequence[Column],
    ts_col: str | None = None,
    within: int | None = None,
    mode: str = "strict",
    quantifiers: str | Sequence[str] | None = None,
) -> DataFrame:
    """CEP strict-contiguity sequence match in streaming — the stateful
    counterpart of ``operators.cep.match_events`` (same contract: per-
    key DENSE monotone ids, overlapping matches, nulls = False; see
    that module's docstring for the semantics and the north-rule
    motivation).

    The step predicates are projected as boolean columns BEFORE the
    stateful op (Catalyst, no Python), so the processor only does id
    arithmetic over bool matrices — numpy-vectorized per Arrow batch.
    State carries exactly the last k-1 rows per key (ids, flags, ts):
    O(keys × k) regardless of stream length. A match is emitted exactly
    once — in the batch its COMPLETING row arrives (matches whose end
    row sat in the carry were emitted previously). No EOS flush arm is
    needed: a sequence either completed or it didn't — there is no
    partial-match state to finalize, unlike windows (eosnotify).

    Cross-batch arrival follows the CB "drop" rule: ids at or below
    the last carried id are discarded (reference out-of-order drop,
    win_seq.hpp:289-305); within-batch disorder is sorted, duplicate
    ids keep the first occurrence.

    ``mode="skip"`` is skip-till-next-match (operators/cep.py
    semantics: every step-0 row opens an overlapping match; each later
    step binds to the EARLIEST following satisfying row). It REQUIRES
    ``ts_col`` + ``within``, which is what bounds the state: open
    matches older than ``within`` can never complete, so state per key
    is the pending starts inside the span bound (plus the step each
    waits for) — the per-step earliest-candidate cohort, not raw rows.
    Additional contract for the expiry rule: ``ts_col`` must be
    non-decreasing with ``id_col`` per key (event-time-ordered ids —
    true of the renumbered transcript/CB ids the engine uses), so
    "last seen ts − ts_first > within" proves no future completion.

    ``quantifiers`` ('1' / '+' per step, batch ``match_events``
    semantics): strict-mode Kleene-plus with GREEDY-MAXIMAL runs.
    State carries the pending partial matches — (start_id, ts_first,
    step, in-run flag) each — plus the last seen (id, ts): a partial
    waiting to BIND a step dies on the very next row unless it
    matches, and an in-run partial persists only while its run keeps
    extending, so state is O(active partials per key), bounded by
    run length, not stream length (a ``within`` bound additionally
    expires pending partials whose minimal possible span already
    exceeds it). One stream-end caveat, batch-parity-excepted: a
    FINAL ``+`` step's run is emitted when a later row CLOSES it
    (predicate fails or id gap — gap closure is a completed match,
    exactly like batch); a run still open when the stream ends is
    never emitted (no partial-match EOS arm, by the same "completed
    or it didn't" construction as fixed-k), whereas batch emits its
    partition-end run.
    """
    import numpy as np

    k = len(steps)
    if k < 2:
        raise ValueError("a sequence pattern needs at least 2 steps")
    if within is not None and ts_col is None:
        raise ValueError("within requires ts_col")
    if mode not in ("strict", "skip"):
        raise ValueError(f"unknown mode {mode!r}: expected 'strict' or 'skip'")
    if mode == "skip" and (within is None or ts_col is None):
        raise ValueError(
            "mode='skip' requires ts_col and within — the span bound is "
            "what keeps pending-match state bounded on an unbounded "
            "stream"
        )
    from windflow_spark.operators.cep import _normalize_quantifiers

    quant = _normalize_quantifiers(quantifiers, k)
    if "+" in quant and mode != "strict":
        raise ValueError(
            "Kleene-plus quantifiers are strict-mode only (greedy runs "
            "are defined by contiguity)"
        )
    proj = df
    for j, s in enumerate(steps):
        proj = proj.withColumn(f"_s{j}", F.coalesce(s.cast("boolean"), F.lit(False)))
    scols = [f"_s{j}" for j in range(k)]
    has_ts = ts_col is not None
    out_cols = [key, "start_id", "end_id"] + (
        ["ts_first", "ts_last"] if has_ts else []
    )
    # ADVICE r6: derive the key field's type instead of hardcoding
    # string — an int/long-keyed caller gets a correct schema, not a
    # runtime mismatch
    key_ddl = df.schema[key].dataType.simpleString()
    out_schema = f"{key} {key_ddl}, start_id long, end_id long" + (
        ", ts_first long, ts_last long" if has_ts else ""
    )
    if mode == "skip":
        return _stream_match_skip(
            proj, key, id_col, scols, ts_col, int(within), k,
            out_cols, out_schema,
        )
    if "+" in quant:
        return _stream_match_kleene(
            proj, key, id_col, scols, quant, ts_col, within, k,
            out_cols, out_schema,
        )
    state_schema = "ids array<long>, ts array<long>, flags array<array<boolean>>"

    def proc(
        kk: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sids, sts, sflags = state.get
            carry_ids = np.asarray(sids, dtype=np.int64)
            carry_ts = np.asarray(sts, dtype=np.int64)
            carry_fl = (
                np.asarray([list(r) for r in sflags], dtype=bool)
                if len(sids)
                else np.empty((0, k), dtype=bool)
            )
        else:
            carry_ids = np.empty(0, dtype=np.int64)
            carry_ts = np.empty(0, dtype=np.int64)
            carry_fl = np.empty((0, k), dtype=bool)
        matches = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            fl = np.column_stack([pdf[c].to_numpy(dtype=bool) for c in scols])
            ts = (
                pdf[ts_col].to_numpy(dtype=np.int64)
                if has_ts
                else np.zeros(len(ids), dtype=np.int64)
            )
            order = np.argsort(ids, kind="stable")
            ids, fl, ts = ids[order], fl[order], ts[order]
            uniq = np.concatenate([[True], ids[1:] != ids[:-1]])
            ids, fl, ts = ids[uniq], fl[uniq], ts[uniq]
            if len(carry_ids):
                keep = ids > carry_ids[-1]
                ids, fl, ts = ids[keep], fl[keep], ts[keep]
            if not len(ids):
                continue
            n_carry = len(carry_ids)
            a_ids = np.concatenate([carry_ids, ids])
            a_fl = np.vstack([carry_fl, fl])
            a_ts = np.concatenate([carry_ts, ts])
            n = len(a_ids)
            if n >= k:
                ok = a_fl[: n - k + 1, 0].copy()
                for j in range(1, k):
                    ok &= a_fl[j : n - k + 1 + j, j]
                ok &= a_ids[k - 1 :] == a_ids[: n - k + 1] + (k - 1)
                if within is not None:
                    ok &= (a_ts[k - 1 :] - a_ts[: n - k + 1]) <= within
                starts = np.nonzero(ok)[0]
                # exactly-once: only matches whose END row arrived now
                starts = starts[starts + k - 1 >= n_carry]
                for i in starts.tolist():
                    row = (kk[0], int(a_ids[i]), int(a_ids[i + k - 1]))
                    if has_ts:
                        row += (int(a_ts[i]), int(a_ts[i + k - 1]))
                    matches.append(row)
            carry_ids = a_ids[max(0, n - (k - 1)) :]
            carry_fl = a_fl[max(0, n - (k - 1)) :]
            carry_ts = a_ts[max(0, n - (k - 1)) :]
        state.update(
            (
                carry_ids.tolist(),
                carry_ts.tolist(),
                [[bool(x) for x in r] for r in carry_fl],
            )
        )
        if matches:
            yield pd.DataFrame(matches, columns=out_cols)

    return proj.groupBy(key).applyInPandasWithState(
        proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def _stream_match_skip(
    proj: DataFrame,
    key: str,
    id_col: str,
    scols: list[str],
    ts_col: str,
    within: int,
    k: int,
    out_cols: list[str],
    out_schema: str,
) -> DataFrame:
    """skip-till-next-match stateful matcher: state = pending starts
    (start_id, ts_first, step-awaited) per key, bounded by the
    ``within`` span. Greedy-earliest binding means every pending match
    at step j binds to the SAME next step-j row, so a batch advances
    whole cohorts with chained ``searchsorted`` over the step-position
    arrays — numpy-vectorized, no per-row Python. Emits exactly once,
    in the batch the completing row arrives; a completion whose span
    exceeds ``within`` is discarded outright (earliest completion is
    minimal, so no later completion can satisfy the bound), and
    pending starts expire once the last seen ts outruns their span."""
    import numpy as np

    state_schema = "sid array<long>, tsf array<long>, stp array<int>, last_id long"

    def proc(
        kk: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_sid, s_tsf, s_stp, last_id = state.get
            pend_sid = np.asarray(s_sid, dtype=np.int64)
            pend_tsf = np.asarray(s_tsf, dtype=np.int64)
            pend_stp = np.asarray(s_stp, dtype=np.int64)
        else:
            pend_sid = np.empty(0, dtype=np.int64)
            pend_tsf = np.empty(0, dtype=np.int64)
            pend_stp = np.empty(0, dtype=np.int64)
            last_id = None
        matches = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            fl = np.column_stack([pdf[c].to_numpy(dtype=bool) for c in scols])
            ts = pdf[ts_col].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids, fl, ts = ids[order], fl[order], ts[order]
            uniq = np.concatenate([[True], ids[1:] != ids[:-1]])
            ids, fl, ts = ids[uniq], fl[uniq], ts[uniq]
            if last_id is not None:
                keep = ids > last_id
                ids, fl, ts = ids[keep], fl[keep], ts[keep]
            if not len(ids):
                continue
            pos = {j: np.nonzero(fl[:, j])[0] for j in range(k)}
            # pending cohorts bind anywhere in this batch (their rows
            # are strictly before it); new starts bind strictly after
            # their own row
            n_pend = len(pend_sid)
            cur_pos = np.concatenate(
                [np.full(n_pend, -1, dtype=np.int64), pos[0]]
            )
            cur_stp = np.concatenate(
                [pend_stp, np.ones(len(pos[0]), dtype=np.int64)]
            )
            sid = np.concatenate([pend_sid, ids[pos[0]]])
            tsf = np.concatenate([pend_tsf, ts[pos[0]]])
            for j in range(1, k):
                m = cur_stp == j
                if not m.any() or not len(pos[j]):
                    continue
                idx = np.searchsorted(pos[j], cur_pos[m], side="right")
                ok = idx < len(pos[j])
                bound = np.where(ok, pos[j][np.minimum(idx, len(pos[j]) - 1)], -1)
                upd_pos = cur_pos[m]
                upd_stp = cur_stp[m]
                upd_pos[ok] = bound[ok]
                upd_stp[ok] = j + 1
                cur_pos[m] = upd_pos
                cur_stp[m] = upd_stp
            done = cur_stp == k
            if done.any():
                ends = cur_pos[done]
                span_ok = (ts[ends] - tsf[done]) <= within
                for s, e, tf in zip(
                    sid[done][span_ok].tolist(),
                    ends[span_ok].tolist(),
                    tsf[done][span_ok].tolist(),
                ):
                    matches.append(
                        (kk[0], int(s), int(ids[e]), int(tf), int(ts[e]))
                    )
            stalled = ~done
            # expiry: ts is non-decreasing in id (contract), so a
            # pending span already past `within` can never complete
            live = stalled & ((int(ts[-1]) - tsf) <= within)
            pend_sid, pend_tsf, pend_stp = sid[live], tsf[live], cur_stp[live]
            last_id = int(ids[-1])
        state.update(
            (
                pend_sid.tolist(),
                pend_tsf.tolist(),
                [int(x) for x in pend_stp.tolist()],
                last_id,
            )
        )
        if matches:
            yield pd.DataFrame(matches, columns=out_cols)

    return proj.groupBy(key).applyInPandasWithState(
        proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def _stream_match_kleene(
    proj: DataFrame,
    key: str,
    id_col: str,
    scols: list[str],
    quant: list[str],
    ts_col: str | None,
    within: int | None,
    k: int,
    out_cols: list[str],
    out_schema: str,
) -> DataFrame:
    """Strict-contiguity Kleene-plus stateful matcher (greedy-maximal
    runs, batch ``_match_events_kleene`` semantics). State per key =
    the pending partial matches — (start_id, ts_first, step, in-run) —
    plus the last seen (id, ts). Advancement is vectorized over
    partials: per batch, each + step's run STOPS are the row positions
    where the predicate fails or contiguity breaks; a cohort of
    partials advances through them with searchsorted exactly like the
    batch join ladder, in at most k vector rounds. A partial WAITING
    to bind a step dies on the next row unless it matches; an IN-RUN
    partial survives batches only while its run spans them, so state
    is O(active partials). Final-+ runs emit on the row that CLOSES
    them (¬p or id gap — gap closure is a completed match, as in
    batch); a run still open at stream end is never emitted (the
    documented stream-end caveat)."""
    import numpy as np

    has_ts = ts_col is not None
    state_schema = (
        "sid array<long>, tsf array<long>, stp array<int>, "
        "run array<boolean>, last_id long, last_ts long"
    )

    def proc(
        kk: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s_sid, s_tsf, s_stp, s_run, last_id, last_ts = state.get
            p_sid = np.asarray(s_sid, dtype=np.int64)
            p_tsf = np.asarray(s_tsf, dtype=np.int64)
            p_stp = np.asarray(s_stp, dtype=np.int64)
            p_run = np.asarray(s_run, dtype=bool)
        else:
            p_sid = np.empty(0, dtype=np.int64)
            p_tsf = np.empty(0, dtype=np.int64)
            p_stp = np.empty(0, dtype=np.int64)
            p_run = np.empty(0, dtype=bool)
            last_id, last_ts = None, None
        matches = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            fl = np.column_stack([pdf[c].to_numpy(dtype=bool) for c in scols])
            ts = (
                pdf[ts_col].to_numpy(dtype=np.int64)
                if has_ts
                else np.zeros(len(ids), dtype=np.int64)
            )
            order = np.argsort(ids, kind="stable")
            ids, fl, ts = ids[order], fl[order], ts[order]
            uniq = np.concatenate([[True], ids[1:] != ids[:-1]])
            ids, fl, ts = ids[uniq], fl[uniq], ts[uniq]
            if last_id is not None:
                keep = ids > last_id
                ids, fl, ts = ids[keep], fl[keep], ts[keep]
            if not len(ids):
                continue
            n = len(ids)
            cont = np.empty(n, dtype=bool)
            cont[0] = last_id is not None and ids[0] == last_id + 1
            cont[1:] = ids[1:] == ids[:-1] + 1
            # per + step: sorted row positions where a run STOPS
            stops = {
                j: np.nonzero(~fl[:, j] | ~cont)[0]
                for j in range(k)
                if quant[j] == "+"
            }

            # partial vectors: resumed partials first, then fresh
            # starts (every p0 row opens one). pos = the row where the
            # partial acts next; resumed W binds at row 0, resumed R
            # re-enters its run "before" row 0 (pos -1 marks it).
            starts0 = np.nonzero(fl[:, 0])[0]
            pos = np.concatenate(
                [np.where(p_run, -1, 0), starts0]
            ).astype(np.int64)
            stp = np.concatenate(
                [p_stp, np.zeros(len(starts0), dtype=np.int64)]
            )
            run = np.concatenate(
                [p_run, np.zeros(len(starts0), dtype=bool)]
            )
            sid = np.concatenate([p_sid, ids[starts0]])
            tsf = np.concatenate([p_tsf, ts[starts0]])
            alive = np.ones(len(pos), dtype=bool)
            pending = np.zeros(len(pos), dtype=bool)

            def _emit(i: int, e: int) -> None:
                """Record a completion ending at batch row e (e == -1 ⇒
                the run closed exactly at the batch boundary: end row =
                previous batch's last row)."""
                eid = int(ids[e]) if e >= 0 else int(last_id)
                ets = int(ts[e]) if e >= 0 else int(last_ts)
                if within is None or ets - int(tsf[i]) <= within:
                    row = (kk[0], int(sid[i]), eid)
                    if has_ts:
                        row += (int(tsf[i]), ets)
                    matches.append(row)

            def _bind(idx, j):
                """Vectorized binding of step j for partials (by index
                array) at their pos: past-end ⇒ pending W(j); else the
                row must satisfy the predicate and (except a fresh
                step-0 start) be contiguous. Returns the indices that
                bound, with their row positions."""
                p = pos[idx]
                past = p >= n
                pending[idx[past]] = True
                inb = idx[~past]
                pi = p[~past]
                okc = fl[pi, j]
                if j > 0:
                    okc = okc & cont[pi]
                alive[inb[~okc]] = False
                return inb[okc], pi[okc]

            for j in range(k):
                m = alive & ~pending & (stp == j)
                if not m.any():
                    continue
                if quant[j] == "+":
                    st = stops[j]
                    # split BEFORE mutating: handling the resumed
                    # cohort rewrites run/stp in place, and a rebound
                    # resumed partial must NOT re-enter this step's
                    # fresh-binding arm
                    mri = np.nonzero(m & run)[0]
                    mbi = np.nonzero(m & ~run)[0]
                    if len(mri):
                        stop0 = int(st[0]) if len(st) else -1
                        if stop0 == -1:
                            pending[mri] = True  # still in run past batch
                        elif j == k - 1:
                            alive[mri] = False
                            for i in mri.tolist():
                                _emit(i, stop0 - 1)
                        else:
                            pos[mri] = stop0  # bind next step at the stop
                            stp[mri] = j + 1
                            run[mri] = False
                    # fresh bindings at pos = start of a new run
                    if len(mbi):
                        bi, bp = _bind(mbi, j)
                        if len(bi):
                            nx = np.searchsorted(st, bp, side="right")
                            has_stop = nx < len(st)
                            # no stop in batch ⇒ pending R(j)
                            pending[bi[~has_stop]] = True
                            run[bi[~has_stop]] = True
                            wi = bi[has_stop]
                            sp = st[nx[has_stop]]
                            if j == k - 1:
                                alive[wi] = False
                                for i, e in zip(wi.tolist(), sp.tolist()):
                                    _emit(i, int(e) - 1)
                            else:
                                pos[wi] = sp
                                stp[wi] = j + 1
                else:  # quantifier '1'
                    bi, bp = _bind(np.nonzero(m)[0], j)
                    if len(bi):
                        if j == k - 1:
                            alive[bi] = False
                            for i, e in zip(bi.tolist(), bp.tolist()):
                                _emit(i, int(e))
                        else:
                            pos[bi] = bp + 1
                            stp[bi] = j + 1
            live = alive & pending
            if within is not None:
                # minimal possible completion span already too long
                live &= (int(ts[-1]) - tsf) <= within
            p_sid, p_tsf = sid[live], tsf[live]
            p_stp, p_run = stp[live], run[live]
            last_id, last_ts = int(ids[-1]), int(ts[-1])
        state.update(
            (
                p_sid.tolist(),
                p_tsf.tolist(),
                [int(x) for x in p_stp.tolist()],
                [bool(x) for x in p_run.tolist()],
                last_id,
                last_ts,
            )
        )
        if matches:
            yield pd.DataFrame(matches, columns=out_cols)

    return proj.groupBy(key).applyInPandasWithState(
        proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def flush_cb_partials(
    spark: SparkSession,
    checkpoint: str,
    key: str,
    spec: WinSpec,
    aggs: dict[str, tuple[str, str | None]] | None = None,
    value_col: str | None = None,
    on_late: str = "drop",
) -> DataFrame:
    """EOS flush of still-open CB windows after a drain — the
    reference's ``eosnotify`` partial-window emission
    (includes/win_seq.hpp:432-474): when the stream ends, every window
    that never saw its last tuple is computed over what it DID see and
    emitted. The batch path gets this for free; a streaming
    ``availableNow`` drain leaves those windows in the state store —
    this reads them back and finalizes them.

    Spark-first shape: the state-store DATA SOURCE
    (``spark.read.format("statestore")``) reads the checkpoint's last
    committed state snapshot as a DataFrame — and because
    ``stream_cb_windows`` pops a window from state the moment it fires,
    whatever remains in ``(wids, parts)`` IS exactly the set of partial
    windows. Finalization is pure Catalyst over the slot arrays (the
    same ``_CB_OPS`` registry layout the processor wrote), so the flush
    is a distributed scan + projection: no replay, no Python, no
    driver-side state walk — it scales with state size, not stream
    length.

    Returns the same schema as ``stream_cb_windows`` (key, gwid,
    aggs..., win_end); union with the drained sink for reference
    parity on truncated streams. Run AFTER the drain query has stopped
    (the reader takes the latest committed version).

    ``on_late`` must match the policy the DRAIN ran with. A
    ``"buffer"`` drain leaves the trailing lateness span of tuples
    un-folded in (buf_ids, buf_vals); the reference's eosnotify folds
    those buffered tuples before emitting partials, so the buffered
    flush first folds the ripe buffer (same last_id dedup + shared
    ``_make_cb_fold`` kernel as the processor — windows whose last
    tuple sat in the buffer fire here, they were never emitted by the
    drain) and then finalizes every still-open window. That path runs
    mapInPandas over the state rows (one per key, no shuffle — still
    scales with state size); the default drop/assume_ordered path
    stays pure Catalyst over the slot arrays.
    """
    if aggs is None:
        if value_col is None:
            raise ValueError("value_col or aggs required")
        aggs = {"sum_value": ("sum", value_col), "cnt": ("count", None)}
    if on_late not in ("assume_ordered", "drop", "buffer"):
        raise ValueError(f"unknown on_late policy {on_late!r}")
    for name, (op, _c) in aggs.items():
        if op not in _CB_OPS:
            raise ValueError(
                f"agg {name!r}: unknown op {op!r} (have {sorted(_CB_OPS)}) "
                "— a register_cb_op() registration is per-process; re-run "
                "it before flushing a drain that used the op"
            )
    st = spark.read.format("statestore").option("path", checkpoint).load()
    if on_late == "buffer" or any(
        _CB_OPS[op][5] is None for op, _c in aggs.values()
    ):
        # buffered drains AND user-registered ops without a Catalyst
        # finalizer route through the mapInPandas arm (Python finalize
        # over one state row per key, no shuffle; drop/assume_ordered
        # drains leave the buffer empty so only the finalize loop runs)
        return _flush_cb_buffered(st, key, spec, aggs)
    gs = st.select(
        F.col(f"key.{key}").alias(key),
        F.col("value.groupState.wids").alias("wids"),
        F.col("value.groupState.parts").alias("parts"),
    )
    ex = gs.select(
        key, F.explode(F.arrays_zip("wids", "parts")).alias("z")
    ).select(
        key,
        F.col("z.wids").alias(GWID),
        F.col("z.parts").alias("_p"),
    )
    out_cols, pos = [], 0
    for name, (op, _c) in aggs.items():
        n_slots, _k, _m, _f, sql_t, cat_fin = _CB_OPS[op]
        out_cols.append(cat_fin(F.col("_p"), pos).cast(sql_t).alias(name))
        pos += n_slots
    return ex.select(
        key,
        GWID,
        *out_cols,
        (F.col(GWID) * spec.slide + spec.win - 1).cast("long").alias("win_end"),
    )


def _flush_cb_buffered(st: DataFrame, key: str, spec: WinSpec, aggs: dict) -> DataFrame:
    """Buffered-drain EOS flush: fold each key's ripe buffered span
    into its open windows (shared kernel + the processor's exact
    last_id/dedup rule), then finalize everything left open. One state
    row per key → mapInPandas, no exchange."""
    import numpy as np

    win, slide = spec.win, spec.slide
    in_cols = sorted({c for _, c in aggs.values() if c is not None})
    out_cols = ", ".join(f"{n} {_CB_OPS[op][4]}" for n, (op, _c) in aggs.items())
    out_schema = f"{key} string, gwid long, {out_cols}, win_end long"
    fold = _make_cb_fold(win, slide, aggs, in_cols)
    names = [key, "gwid", *aggs.keys(), "win_end"]

    gs = st.select(
        F.col(f"key.{key}").alias(key),
        F.col("value.groupState.wids").alias("wids"),
        F.col("value.groupState.parts").alias("parts"),
        F.col("value.groupState.last_id").alias("last_id"),
        F.col("value.groupState.buf_ids").alias("buf_ids"),
        F.col("value.groupState.buf_vals").alias("buf_vals"),
    )

    def flush(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            recs = []
            for row in pdf.itertuples(index=False):
                open_w = {int(w): list(p) for w, p in zip(row.wids, row.parts)}
                fired = []
                bi = np.asarray(row.buf_ids, dtype=np.int64)
                if len(bi):
                    bv = {c: np.asarray(v, dtype=np.float64)
                          for c, v in zip(in_cols, row.buf_vals)}
                    order = np.argsort(bi, kind="stable")
                    bi = bi[order]
                    bv = {c: v[order] for c, v in bv.items()}
                    keep = bi > row.last_id
                    bi = bi[keep]
                    bv = {c: v[keep] for c, v in bv.items()}
                    if len(bi):
                        uniq = np.concatenate([[True], bi[1:] != bi[:-1]])
                        bi = bi[uniq]
                        bv = {c: v[uniq] for c, v in bv.items()}
                        fired += fold(bi, bv, open_w)
                for w, part in sorted(open_w.items()):
                    outs, pos = [], 0
                    for op, _c in aggs.values():
                        ns = _CB_OPS[op][0]
                        outs.append(_CB_OPS[op][3](part[pos:pos + ns]))
                        pos += ns
                    fired.append((w, *outs, w * slide + win - 1))
                recs += [(getattr(row, key), *r) for r in sorted(fired)]
            if recs:
                yield pd.DataFrame(recs, columns=names)

    return gs.mapInPandas(flush, out_schema)


#: Catalyst aggregation-buffer layout per declared op (slots appear in
#: the state value struct in agg declaration order; avg carries its
#: (sum, count) pair)
_TB_BUFFER_SLOTS = {"count": 1, "sum": 1, "min": 1, "max": 1, "avg": 2}

#: buffer field NAMES Catalyst writes per op (probed from real
#: checkpoints: count→'count', sum→'sum', min→'min', max→'max',
#: avg→('sum','count')) — validated against the declared aggs so a
#: flush run with a different-but-equal-slot-count aggs dict than the
#: drain's (e.g. min declared where the drain aggregated sum) fails
#: loud instead of silently decoding wrong values (ADVICE r5 #2)
_TB_BUFFER_FIELDS = {"count": ("count",), "sum": ("sum",), "min": ("min",),
                     "max": ("max",), "avg": ("sum", "count")}


def _check_buffer_fields(fields, aggs: dict[str, str], context: str) -> None:
    """Cross-check the checkpoint's aggregation-buffer field names
    against the declared ops (same order). Residual ambiguity, by
    construction: a drain's single ``avg`` exposes the same
    ('sum', 'count') field pair as a declared ``sum`` + ``count`` over
    a double column — indistinguishable from the schema alone; every
    single-op swap (sum vs min vs max vs count) IS caught."""
    expected = [
        (name, op, b) for name, op in aggs.items()
        for b in _TB_BUFFER_FIELDS[op]
    ]
    fields = list(fields)
    if len(fields) != len(expected):
        raise ValueError(
            f"{context}: checkpoint holds {len(fields)} aggregation-"
            f"buffer fields but the declared aggs expect "
            f"{len(expected)} — a name-prefix subset would pass the "
            "per-field check and fail later at the positional struct "
            "cast; pass the same aggs dict the drain ran with"
        )
    bad = [
        f"field {f.name!r} where agg {agg_name!r} ({op}) expects {exp_b!r}"
        for f, (agg_name, op, exp_b) in zip(fields, expected)
        if f.name.lower() != exp_b
    ]
    if bad:
        raise ValueError(
            f"{context}: checkpoint buffer fields do not match the "
            f"declared aggs — {'; '.join(bad)}; pass the same aggs "
            "dict the drain ran with"
        )


def _agg_buffer_cols(aggs: dict[str, str], slot_names: Sequence[str],
                     offset: int = 0) -> list[Column]:
    """Project declared-op aggregation buffers out of a positionally
    renamed state value struct ``_v`` — the decode loop shared by the
    TB and session eosnotify arms so the slot walk can't diverge
    between them: one output column per agg, avg = sum/count over its
    slot pair, starting at ``offset`` slots in."""
    out, pos = [], offset
    for name, op in aggs.items():
        col = (
            F.col(f"_v.{slot_names[pos]}") / F.col(f"_v.{slot_names[pos + 1]}")
            if op == "avg"
            else F.col(f"_v.{slot_names[pos]}")
        )
        out.append(col.alias(name))
        pos += _TB_BUFFER_SLOTS[op]
    return out


def flush_tb_partials(
    spark: SparkSession,
    checkpoint: str,
    keys: Sequence[str],
    spec: WinSpec,
    aggs: dict[str, str],
    unit: str = "second",
) -> DataFrame:
    """EOS flush of unemitted TB windows after an APPEND-mode drain —
    the time-based arm of the eosnotify rule (win_seq.hpp:432-474).
    Append mode emits a window only when the watermark passes its end,
    so every window inside the final watermark delay is still sitting
    in the aggregation state when an ``availableNow`` drain stops; a
    truncated stream therefore under-reports vs the reference (and vs
    the batch plan) by exactly those trailing windows. (The
    complete-mode memory sink doesn't have this gap — only the
    production parquet/append path does.)

    Spark emits-and-EVICTS below the watermark in the same micro-batch,
    so the statestore data source over the drain checkpoint reads
    exactly the unemitted windows: emitted ∪ flushed == the batch
    aggregate, row for row (asserted in tests). The state value struct
    carries the Catalyst aggregation BUFFERS in agg declaration order
    (avg = (sum, count)), hence ``aggs`` here maps each output name to
    its declared OP (one of sum/count/min/max/avg), mirroring the
    ``aggs`` dict the drain passed to ``stream_win_tb`` — a wrapped
    expression like ``F.round(F.sum(x), 4)`` buffers as its inner agg,
    so apply the rounding to this function's output, not inside.

    ``spec``/``unit`` recover gwid from the window start with the same
    formula as ``stream_win_tb`` (hopping's tumbling-of-slide rewrite
    included, since gwid divides by slide either way). Distributed
    scan + projection; no replay, no Python. Run after the drain query
    has stopped.
    """
    for name, op in aggs.items():
        if op not in _TB_BUFFER_SLOTS:
            raise ValueError(
                f"agg {name!r}: unknown op {op!r} (have {sorted(_TB_BUFFER_SLOTS)})"
            )
    micros_per = {"microsecond": 1, "millisecond": 1_000, "second": 1_000_000}[unit]
    st = spark.read.format("statestore").option("path", checkpoint).load()
    # the TB value struct is exactly the agg buffers, declaration order
    _check_buffer_fields(
        st.schema["value"].dataType.fields, aggs, "flush_tb_partials"
    )
    # buffer field NAMES duplicate across aggs (two sums ⇒ two 'sum'
    # fields), which trips analysis on by-name access AND the V2
    # pushdown rule on `value.*`; struct CASTS are positional, so cast
    # the whole buffer struct to uniquely-named slots instead. Counts
    # stay bigint; value slots go through double (sum/min/max over an
    # integer column buffer as long — exact to 2^53).
    slot_types = {"count": ["bigint"], "sum": ["double"], "min": ["double"],
                  "max": ["double"], "avg": ["double", "bigint"]}
    slots = [t for op in aggs.values() for t in slot_types[op]]
    slot_names = [f"_s{i}" for i in range(len(slots))]
    ddl = ", ".join(f"{n}: {t}" for n, t in zip(slot_names, slots))
    flat = st.select(
        *[F.col(f"key.{k}").alias(k) for k in keys],
        F.col("key.window.start").alias("_wstart"),
        F.col("value").cast(f"struct<{ddl}>").alias("_v"),
    )
    return flat.select(
        *keys,
        *_agg_buffer_cols(aggs, slot_names),
        floordiv(F.unix_micros(F.col("_wstart")), spec.slide * micros_per)
        .alias(GWID),
    )


def flush_session_partials(
    spark: SparkSession,
    checkpoint: str,
    keys: Sequence[str],
    aggs: dict[str, str],
) -> DataFrame:
    """EOS flush of unemitted SESSION windows after an append-mode
    drain — the session arm of the eosnotify rule (win_seq.hpp:432-474),
    completing the symmetry with ``flush_cb_partials`` (count windows)
    and ``flush_tb_partials`` (time windows): append mode emits a
    session only once the watermark passes its end, so the trailing
    watermark-delay span of sessions is still in the session-merge
    state when an ``availableNow`` drain stops.

    The statestore data source reads that state as one row per open
    session — key = (group keys, sessionStartTime), value = (group
    keys, session_window struct, then the Catalyst aggregation BUFFERS
    in agg declaration order, avg = (sum, count)) — and because Spark
    emits-and-evicts closed sessions in the same micro-batch, what
    remains IS exactly the unemitted set: emitted ∪ flushed == the
    batch session output, row for row (gate: streaming_session_eos).

    ``aggs`` maps each output name to its declared op (sum/count/min/
    max/avg), mirroring the dict passed to ``stream_session`` — same
    contract as ``flush_tb_partials``. Buffer field names duplicate
    across aggs, so the value struct is cast POSITIONALLY to
    uniquely-named slots (types taken from the checkpoint's own
    schema). Output matches ``stream_session``: (keys…, aggs…,
    session_start, session_end_excl). Pure scan + projection; run
    after the drain query has stopped."""
    for name, op in aggs.items():
        if op not in _TB_BUFFER_SLOTS:
            raise ValueError(
                f"agg {name!r}: unknown op {op!r} (have {sorted(_TB_BUFFER_SLOTS)})"
            )
    st = spark.read.format("statestore").option("path", checkpoint).load()
    vt = st.schema["value"].dataType
    n_expected = len(keys) + 1 + sum(_TB_BUFFER_SLOTS[op] for op in aggs.values())
    if len(vt.fields) != n_expected:
        raise ValueError(
            f"session state value has {len(vt.fields)} fields, expected "
            f"{n_expected} for {len(keys)} keys + window + declared aggs "
            "— pass the same keys/aggs the drain used"
        )
    # beyond the slot COUNT, the buffer field names must match the
    # declared ops (ADVICE r5 #2: {'a':'avg'} vs {'x':'sum','y':'min'}
    # have equal slot totals but different buffers)
    _check_buffer_fields(
        vt.fields[len(keys) + 1:], aggs, "flush_session_partials"
    )
    slot_names = [f"_s{i}" for i in range(len(vt.fields))]
    ddl = ", ".join(
        f"{n}: {f.dataType.simpleString()}" for n, f in zip(slot_names, vt.fields)
    )
    flat = st.select(
        *[F.col(f"key.{k}").alias(k) for k in keys],
        F.col("value").cast(f"struct<{ddl}>").alias("_v"),
    )
    win_slot = slot_names[len(keys)]  # the session_window struct
    return flat.select(
        *keys,
        *_agg_buffer_cols(aggs, slot_names, offset=len(keys) + 1),
        F.unix_micros(F.col(f"_v.{win_slot}.start").cast("timestamp")).alias(
            "session_start"
        ),
        F.unix_micros(F.col(f"_v.{win_slot}.end").cast("timestamp")).alias(
            "session_end_excl"
        ),
    )


def stream_accumulate(
    df: DataFrame,
    key: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Streaming Accumulator: keyed rolling reduce emitting the running
    (sum, count) after EVERY input tuple (reference
    includes/accumulator.hpp:157-192, emit at :181) via a keyed
    stateful processor. Requires per-key-ordered arrival (same contract
    as stream_cb_windows)."""
    out_schema = f"{key} string, {id_col} long, running_sum double, running_cnt long"
    state_schema = "s double, c long"

    def proc(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        s, c = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            vals = pdf[value_col].to_numpy(dtype=np.float64)
            order = np.argsort(ids, kind="stable")
            ids, vals = ids[order], vals[order]
            run_s = s + np.cumsum(vals)
            run_c = c + np.arange(1, len(ids) + 1, dtype=np.int64)
            s, c = float(run_s[-1]), int(run_c[-1])
            yield pd.DataFrame(
                {
                    key: k[0],
                    id_col: ids,
                    "running_sum": run_s,
                    "running_cnt": run_c,
                }
            )
        state.update((s, c))

    return df.groupBy(key).applyInPandasWithState(
        proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    bound_secs: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: right events within
    [left_ts - bound, left_ts] on equal keys (north-rule assistant ↔
    triggering user/tool correlation). Emits ALL matches in the bound;
    a downstream aggregate picks the latest (the batch asof_join does
    both in one plan)."""
    l = _as_ts(left, left_ts).withWatermark(left_ts, watermark).alias("l")
    r = _as_ts(right, right_ts).withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {bound_secs} SECONDS")
        )
    )
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return l.join(r, on=cond, how="inner")


def run_available_now(
    df: DataFrame,
    sink_path: str,
    checkpoint: str,
    output_mode: str = "append",
    timeout_sec: int = 300,
) -> None:
    """Drain the stream exactly-once into a parquet sink: availableNow
    processes the full backlog through the normal micro-batch +
    checkpoint machinery then stops (crash-resumable at any point —
    the checkpoint manifest dedups on restart)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"stream did not drain in {timeout_sec}s")


def run_to_memory(
    df: DataFrame, name: str, spark: SparkSession, output_mode: str = "complete",
    timeout_sec: int = 300,
) -> DataFrame:
    """availableNow drain into an in-memory table (test/inspection sink)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"stream did not drain in {timeout_sec}s")
    return spark.table(name)


class MetricsListener:
    """Per-batch lineage + metrics JSONL (north rule: per-partition
    lineage and metrics; the Spark analogue of the reference's
    per-replica LOG_DIR stats, includes/win_seq.hpp:479-502)."""

    def __init__(self, out_path: str):
        self.out_path = out_path
        self.rows: list[dict] = []

    def attach(self, spark: SparkSession) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                rec = {
                    "ts": p.timestamp,
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "input_rows_per_sec": p.inputRowsPerSecond,
                    "processed_rows_per_sec": p.processedRowsPerSecond,
                    "batch_duration_ms": p.batchDuration,
                    "sources": [s.description for s in p.sources],
                    "state_rows": [
                        so.numRowsTotal for so in p.stateOperators
                    ],
                    "watermark": p.eventTime.get("watermark")
                    if p.eventTime
                    else None,
                }
                outer.rows.append(rec)
                with open(outer.out_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        self._listener = _L()
        spark.streams.addListener(self._listener)

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self._listener)

    def p99_batch_ms(self) -> float | None:
        if not self.rows:
            return None
        ds = sorted(r["batch_duration_ms"] for r in self.rows)
        return ds[min(len(ds) - 1, int(0.99 * len(ds)))]


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf runtime for its
    state-server protocol; absent in this container (pip install is
    unavailable). Present on standard cluster images."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_cb_windows_tws(
    df: DataFrame,
    key: str,
    id_col: str,
    value_col: str | None,
    spec: WinSpec,
    aggs: dict[str, tuple[str, str | None]] | None = None,
    idle_flush_ms: int | None = None,
) -> DataFrame:
    """Count-based windows on the transformWithStateInPandas API
    (Spark 4.x successor of applyInPandasWithState): typed per-key
    ValueState, Arrow-batched input, same Triggerer_CB fire rule and
    the same ``aggs`` registry contract as stream_cb_windows (the two
    paths share the ``_make_cb_fold`` kernel and state slot layout, so
    they stay interchangeable). Kept alongside the classic
    implementation — parity-tested against it — as the forward path.

    ``idle_flush_ms`` — CONTINUOUS-MODE eosnotify (win_seq.hpp:432-474
    for a query that never drains, VERDICT r5 #6): when set, the
    processor runs in processing-time mode and keeps one timer per key
    at (last input's processing time + idle_flush_ms), re-armed on
    every batch that brings the key data. If the key then stays idle
    past the deadline, the timer fires and the still-open PARTIAL
    windows are finalized, emitted, and cleared — the per-key analogue
    of the reference's end-of-stream flush for live queries, where the
    statestore-read flush arms (flush_cb_partials) can't apply because
    the query never stops. A key that receives data AFTER its flush
    restarts from empty state (CB ids keep their per-key meaning; the
    flush marks the logical end of that key's stream, exactly like
    eosnotify). Uses the same _CB_OPS finalize as the fired path, so
    flushed rows are indistinguishable from an EOS flush's. Needs the
    protobuf runtime (cluster images) — covered by
    tools/cluster_verify.py's tws_timer_idle_flush arm.

    State-format note: since r4 the value state is the generic
    (wids array<long>, parts array<array<double>>) slot layout — a
    checkpoint written by the r2-era (wids, sums, cnts) schema does NOT
    resume against this version (state-schema validation fails);
    restart the query with a fresh checkpoint. Count slots travel as
    doubles inside the parts arrays (exact to 2^53 rows per window)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf "
            "(missing in this environment) — use stream_cb_windows"
        )

    import numpy as np

    if aggs is None:
        if value_col is None:
            raise ValueError("value_col or aggs required")
        aggs = {"sum_value": ("sum", value_col), "cnt": ("count", None)}
    for name, (op, _c) in aggs.items():
        if op not in _CB_OPS:
            raise ValueError(f"agg {name!r}: unknown op {op!r} (have {sorted(_CB_OPS)})")
    win, slide = spec.win, spec.slide
    in_cols = sorted({c for _, c in aggs.values() if c is not None})
    out_cols = ", ".join(
        f"{n} {_CB_OPS[op][4]}" for n, (op, _c) in aggs.items()
    )
    out_schema = f"{key} string, gwid long, {out_cols}, win_end long"
    fold = _make_cb_fold(win, slide, aggs, in_cols)

    cols = [key, "gwid", *aggs.keys(), "win_end"]

    class CBWindows(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # generic slot layout (parts per open window) — same state
            # shape as stream_cb_windows, so the two paths stay
            # interchangeable as aggs generalize
            self._handle = handle
            self._state = handle.getValueState(
                "open_windows", "wids array<long>, parts array<array<double>>"
            )

        def handleInputRows(self, k, rows, timerValues):
            got = self._state.get()
            open_w = (
                {int(w): list(p) for w, p in zip(got[0], got[1])}
                if got is not None
                else {}
            )
            fired = []
            # numpy fold per Arrow batch (no per-row Python): shared
            # kernel with stream_cb_windows (_make_cb_fold)
            for pdf in rows:
                if not len(pdf):
                    continue
                ids = pdf[id_col].to_numpy(dtype=np.int64)
                vals = {c: pdf[c].to_numpy(dtype=np.float64) for c in in_cols}
                order = np.argsort(ids, kind="stable")
                fired += fold(
                    ids[order], {c: v[order] for c, v in vals.items()}, open_w
                )
            items = sorted(open_w.items())
            self._state.update(
                (
                    [w for w, _ in items],
                    [list(map(float, p)) for _, p in items],
                )
            )
            if idle_flush_ms is not None:
                # one idle deadline per key: re-arm on every batch that
                # brings this key data (delete-then-register keeps a
                # single outstanding timer)
                for ts in list(self._handle.listTimers()):
                    self._handle.deleteTimer(ts)
                self._handle.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs() + idle_flush_ms
                )
            if fired:
                yield pd.DataFrame(
                    [(k[0], *row) for row in sorted(fired)],
                    columns=cols,
                )

        def handleExpiredTimer(self, k, timerValues, expiredTimerInfo):
            # idle-key eosnotify: finalize every still-open window with
            # the registry finalizers (identical to flush_cb_partials'
            # projection), emit, and clear — this key's stream has
            # logically ended
            got = self._state.get()
            if got is None:
                return
            flushed = []
            for w, part in sorted(zip(got[0], got[1])):
                outs, pos = [], 0
                for op, _c in aggs.values():
                    ns = _CB_OPS[op][0]
                    outs.append(_CB_OPS[op][3](list(part[pos:pos + ns])))
                    pos += ns
                flushed.append((int(w), *outs, int(w) * slide + win - 1))
            self._state.clear()
            if flushed:
                yield pd.DataFrame(
                    [(k[0], *row) for row in flushed], columns=cols
                )

        def close(self) -> None:
            pass

    return df.groupBy(key).transformWithStateInPandas(
        CBWindows(), out_schema, "append",
        "processingTime" if idle_flush_ms is not None else "none",
    )


def run_available_now_ordered(
    df: DataFrame,
    sink_path: str,
    checkpoint: str,
    order_by: Sequence[str],
    timeout_sec: int = 300,
) -> None:
    """Exactly-once drain with ORDERED per-micro-batch emission — the
    WF_Collector semantics (wf_nodes.hpp:399-468) in streaming: each
    batch's results are written sorted by ``order_by`` (cross-batch
    total order additionally needs the deterministic (key, gwid) sort
    the readers apply — same caveat the reference documents for
    multi-emitter runs).

    foreachBatch alone is at-least-once (a crash between write and
    checkpoint commit replays the batch), so the write is made
    idempotent: each batch lands in its own ``batch_id=<n>`` partition
    directory with mode=overwrite — a replay rewrites the same
    directory instead of appending duplicates. Readers get a
    ``batch_id`` partition column for free (per-batch lineage)."""

    def write_sorted(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.orderBy(*order_by)
            .write.mode("overwrite")
            .parquet(f"{sink_path}/batch_id={batch_id}")
        )

    q = (
        df.writeStream.foreachBatch(write_sorted)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"stream did not drain in {timeout_sec}s")
