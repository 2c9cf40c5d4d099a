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
  ``availableNow`` trigger drains the backlog and stops (the EOS flush
  of includes/win_seq.hpp:432-474: remaining windows emitted when the
  watermark advances past them / on final commit).

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

from windflow_spark.operators.windows import GWID, WinSpec


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
    start for row parity with the batch plan."""
    micros_per = {"microsecond": 1, "millisecond": 1_000, "second": 1_000_000}[unit]
    out = (
        _as_ts(df, ts_col).withWatermark(ts_col, watermark)
        .groupBy(
            *[F.col(k) for k in keys],
            F.window(F.col(ts_col), f"{spec.win} {unit}", f"{spec.slide} {unit}").alias("w"),
        )
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    return out.withColumn(
        GWID,
        (F.unix_micros(F.col("w.start")) / F.lit(spec.slide * micros_per)).cast("long"),
    ).drop("w")


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


def stream_cb_windows(
    df: DataFrame,
    key: str,
    id_col: str,
    value_col: str,
    spec: WinSpec,
    on_late: str = "assume_ordered",
) -> DataFrame:
    """Count-based windows in streaming: keyed stateful processor via
    applyInPandasWithState.

    State per key: running partial (sum, cnt) per open window id plus
    the last processed id. A tuple with per-key monotone id ``i``
    belongs to wids [max(0, floor((i-win)/slide)+1), floor(i/slide)];
    window w fires (is emitted) when its last tuple
    (id == w*slide+win-1) arrives — Triggerer_CB
    (includes/window.hpp:49-67). Partial windows remain in state;
    batch-mode covers the EOS partial flush.

    ``on_late`` — cross-batch out-of-order policy:
    - "assume_ordered": ids arrive in order per key across batches
      (transcripts / single-writer file sources); cheapest.
    - "drop": REFERENCE PARITY — any id ≤ the last processed id for the
      key is discarded, exactly the reference's out-of-order drop rule
      (includes/win_seq.hpp:289-305, wf_nodes.hpp:104-121).
    Within a batch, rows are always processed in id order.
    """
    if on_late not in ("assume_ordered", "drop"):
        raise ValueError(f"unknown on_late policy {on_late!r}")
    win, slide = spec.win, spec.slide
    out_schema = f"{key} string, gwid long, sum_value double, cnt long, win_end long"
    state_schema = "wids array<long>, sums array<double>, cnts array<long>, last_id long"

    def proc(
        k: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            wids, sums, cnts, last_id = state.get
            open_w = {w: [s, c] for w, s, c in zip(wids, sums, cnts)}
        else:
            open_w, last_id = {}, -1
        fired = []
        for pdf in pdfs:
            pdf = pdf.sort_values(id_col)
            for i, v in zip(pdf[id_col], pdf[value_col]):
                i = int(i)
                if on_late == "drop":
                    if i <= last_id:
                        continue  # reference drop rule
                    last_id = i
                last = i // slide
                first = max(0, (i - win) // slide + 1)
                for w in range(first, last + 1):
                    part = open_w.setdefault(w, [0.0, 0])
                    part[0] += float(v)
                    part[1] += 1
                    if i == w * slide + win - 1:  # Triggerer_CB fire
                        fired.append(
                            (k[0], w, part[0], part[1], w * slide + win - 1)
                        )
                        del open_w[w]
        items = sorted(open_w.items())
        state.update(
            (
                [w for w, _ in items],
                [p[0] for _, p in items],
                [p[1] for _, p in items],
                last_id,
            )
        )
        if fired:
            yield pd.DataFrame(
                fired, columns=[key, "gwid", "sum_value", "cnt", "win_end"]
            )

    return (
        df.groupBy(key)
        .applyInPandasWithState(
            proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
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
        s, c = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(id_col)
            rows = []
            for i, v in zip(pdf[id_col], pdf[value_col]):
                s += float(v)
                c += 1
                rows.append((k[0], int(i), s, c))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[key, id_col, "running_sum", "running_cnt"]
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
    value_col: str,
    spec: WinSpec,
) -> DataFrame:
    """Count-based windows on the transformWithStateInPandas API
    (Spark 4.x successor of applyInPandasWithState): typed per-key
    ValueState, Arrow-batched input, same Triggerer_CB fire rule as
    stream_cb_windows. Kept alongside the classic implementation —
    parity-tested against it — as the forward path (timers enable
    future EOS flush of partial windows in continuous mode)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf "
            "(missing in this environment) — use stream_cb_windows"
        )

    win, slide = spec.win, spec.slide
    out_schema = f"{key} string, gwid long, sum_value double, cnt long, win_end long"

    class CBWindows(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "open_windows",
                "wids array<long>, sums array<double>, cnts array<long>",
            )

        def handleInputRows(self, k, rows, timerValues):
            got = self._state.get()
            if got is not None:
                wids, sums, cnts = got
                open_w = {w: [s, c] for w, s, c in zip(wids, sums, cnts)}
            else:
                open_w = {}
            fired = []
            for pdf in rows:
                pdf = pdf.sort_values(id_col)
                for i, v in zip(pdf[id_col], pdf[value_col]):
                    i = int(i)
                    last = i // slide
                    first = max(0, (i - win) // slide + 1)
                    for w in range(first, last + 1):
                        part = open_w.setdefault(w, [0.0, 0])
                        part[0] += float(v)
                        part[1] += 1
                        if i == w * slide + win - 1:  # Triggerer_CB
                            fired.append(
                                (k[0], w, part[0], part[1], w * slide + win - 1)
                            )
                            del open_w[w]
            items = sorted(open_w.items())
            self._state.update(
                (
                    [w for w, _ in items],
                    [p[0] for _, p in items],
                    [p[1] for _, p in items],
                )
            )
            if fired:
                yield pd.DataFrame(
                    fired, columns=[key, "gwid", "sum_value", "cnt", "win_end"]
                )

        def close(self) -> None:
            pass

    return df.groupBy(key).transformWithStateInPandas(
        CBWindows(), out_schema, "append", "none"
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
    multi-emitter runs)."""

    def write_sorted(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.orderBy(*order_by)
            .write.mode("append")
            .parquet(sink_path)
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
