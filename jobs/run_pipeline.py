"""spark-submit entrypoint (north rule: `spark-submit --py-files` job,
resumable from checkpoint, per-partition lineage + metrics).

Runs the flagship transcripts pipeline as a Structured Streaming job:
file/Iceberg source → watermarked windowed aggregate keyed by conv_id →
exactly-once parquet sink, RocksDB state store, metrics JSONL.

Usage:
  spark-submit --py-files windflow_spark.zip jobs/run_pipeline.py \
      --input <dir> --output <dir> --checkpoint <dir> \
      [--mode tumbling|sliding|session|cb|join|hopping|nic] [--once] [--metrics m.jsonl]

`--once` uses availableNow (drain backlog and exit — idempotent,
resumable); without it the query runs continuously. Re-running with the
same --checkpoint resumes exactly-once.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir of transcripts")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--mode", default="tumbling",
                    choices=["tumbling", "sliding", "session", "cb", "join",
                             "hopping", "nic"])
    ap.add_argument("--win", type=int, default=60, help="window seconds")
    ap.add_argument("--slide", type=int, default=15, help="slide seconds")
    ap.add_argument("--cb-win", type=int, default=8,
                    help="cb-mode window length in tuples")
    ap.add_argument("--cb-slide", type=int, default=4,
                    help="cb-mode slide in tuples")
    ap.add_argument("--gap", type=int, default=120, help="session gap seconds")
    ap.add_argument("--watermark", default="5 minutes")
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--flush-partials", action="store_true",
                    help="after a --once drain, write the still-open "
                         "(partial) windows from the checkpoint state to "
                         "<output>_partials — the reference's EOS flush "
                         "(win_seq.hpp:432-474); tumbling/sliding/hopping/"
                         "cb/session modes")
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()

    from windflow_spark.operators.windows import WinSpec
    from windflow_spark.session import get_spark
    from windflow_spark.streaming import engine as se

    spark = get_spark("windflow-pipeline", streaming=True)
    listener = None
    if args.metrics:
        listener = se.MetricsListener(args.metrics)
        listener.attach(spark)

    schema = spark.read.parquet(args.input).schema
    src = se.stream_source(spark, args.input, schema)
    turns = src.withColumn("text_len", F.length("text"))
    # ONE spec per mode family, shared by the drain and the EOS flush —
    # two independent spec literals desync the flush's gwid/win_end
    # from the drained state layout with no error
    cb_spec = WinSpec("cb", args.cb_win, args.cb_slide)
    tb_spec = WinSpec(
        "tb", args.win,
        args.slide if args.mode in ("sliding", "hopping") else args.win,
    )

    if args.mode == "tumbling":
        out = se.stream_win_tb(
            turns, ["conv_id"], "ts", tb_spec,
            aggs={"cnt": F.count(F.lit(1)), "sum_len": F.sum("text_len")},
            watermark=args.watermark,
        )
    elif args.mode == "sliding":
        out = se.stream_win_tb(
            turns, ["conv_id"], "ts", tb_spec,
            aggs={"cnt": F.count(F.lit(1)), "sum_len": F.sum("text_len")},
            watermark=args.watermark,
        )
    elif args.mode == "hopping":
        # win < slide — routed through the tumbling-of-slide rewrite
        out = se.stream_win_tb(
            turns, ["conv_id"], "ts", tb_spec,
            aggs={"cnt": F.count(F.lit(1)), "sum_len": F.sum("text_len")},
            watermark=args.watermark,
        )
    elif args.mode == "nic":
        # whole-window UDF over the windowed archive (streaming NIC)
        def _median_len(w):
            return {"median_len": float(w["text_len"].median()), "cnt": len(w)}

        out = se.stream_win_tb_nic(
            turns, ["conv_id"], "ts", tb_spec,
            _median_len, "median_len double, cnt long",
            payload_cols=["text_len"], watermark=args.watermark,
        )
    elif args.mode == "session":
        out = se.stream_session(
            turns, ["conv_id"], "ts", f"{args.gap} seconds",
            aggs={"cnt": F.count(F.lit(1))}, watermark=args.watermark,
        )
    elif args.mode == "cb":
        out = se.stream_cb_windows(
            turns.withColumn("text_len", F.col("text_len").cast("double")),
            "conv_id", "turn_idx", "text_len", cb_spec,
        )
    else:  # join
        left = turns.filter(F.col("role") == "assistant").select(
            "conv_id", F.col("turn_idx").alias("a_turn"), F.col("ts").alias("a_ts")
        )
        right = turns.filter(F.col("role").isin("user", "tool")).select(
            "conv_id", F.col("turn_idx").alias("t_turn"), F.col("ts").alias("t_ts")
        )
        out = se.stream_interval_join(
            left, right, ["conv_id"], "a_ts", "t_ts", bound_secs=args.win,
            watermark=args.watermark,
        ).select("l.conv_id", "a_turn", "t_turn")

    # watermarked aggregates emit finalized windows in append mode —
    # the exactly-once contract the sink needs
    if args.once:
        se.run_available_now(out, args.output, args.checkpoint,
                             timeout_sec=args.timeout)
        n = spark.read.parquet(args.output).count()
        print(f"windflow-pipeline: drained; sink rows = {n}")
        if args.flush_partials:
            # EOS flush (win_seq.hpp:432-474): finalize the windows the
            # watermark / Triggerer never closed. Written to a sibling
            # dir in overwrite mode — a replayed drain re-derives the
            # same partial set, so the flush stays idempotent and the
            # main sink keeps its exactly-once manifest untouched.
            if args.mode in ("tumbling", "sliding", "hopping"):
                flushed = se.flush_tb_partials(
                    spark, args.checkpoint, ["conv_id"], tb_spec,
                    aggs={"cnt": "count", "sum_len": "sum"},
                )
            elif args.mode == "cb":
                flushed = se.flush_cb_partials(
                    spark, args.checkpoint, "conv_id", cb_spec,
                    value_col="text_len",
                )
            elif args.mode == "session":
                flushed = se.flush_session_partials(
                    spark, args.checkpoint, ["conv_id"], aggs={"cnt": "count"},
                )
            else:
                raise SystemExit(
                    f"--flush-partials unsupported for mode {args.mode!r}"
                )
            flushed.write.mode("overwrite").parquet(f"{args.output}_partials")
            np = spark.read.parquet(f"{args.output}_partials").count()
            print(f"windflow-pipeline: flushed partial windows = {np}")
    else:
        q = (
            out.writeStream.format("parquet")
            .option("path", args.output)
            .option("checkpointLocation", args.checkpoint)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()


if __name__ == "__main__":
    main()
