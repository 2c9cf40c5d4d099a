"""Benchmark harness (driver contract + BASELINE.md protocol).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}

- per-query wall times for the headline operator battery at
  $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), executed to a
  noop sink (full pipeline execution, no driver collect).
- sustained events/sec on the flagship sliding-window pipeline over an
  amplified event stream (xAMP self-replication of the input so the
  measurement isn't dominated by fixed JVM/job overhead; row count
  reported).
- scaling efficiency N→4N cores (BASELINE.md sandbox protocol):
  identical flagship job at local[8] vs local[32] in fresh JVMs,
  shuffle partitions scaled with cores; efficiency = T32/(4*T8)
  (throughput ratio).

Usage:
  python bench.py                 # full battery + scaling
  python bench.py --no-scaling    # skip the two-JVM scaling runs
  python bench.py --single 8      # internal: one flagship run at local[8]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
AMP = int(os.environ.get("SPARK_GRAFT_BENCH_AMP", "1024"))

HEADLINE = [
    "win_tb_tumbling",
    "win_tb_sliding",
    "win_cb_sliding",
    "win_nic_median",
    "pane_farm_sliding",
    "win_mapreduce_sliding",
    "session_windows",
    "accumulator",
    "asof_join",
    "ysb_pipeline",
    "micro1_stateless",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_topk",
    "text_quality",
]


def _spark(master: str, parts: int):
    from windflow_spark.session import get_spark

    import os as _os

    _os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    return get_spark(
        "windflow-bench", master=master, shuffle_partitions=parts,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "64MB",
            # throughput GC: the windowed-agg path is allocation-heavy;
            # G1 pauses cost ~20% at 32 threads on this class of job
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:NewRatio=1",
        },
    )


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _amp_path(amp: int) -> str:
    return f"/tmp/windflow_bench/events_amp{amp}"


def materialize_amplified(spark, sf_dir: str, amp: int, n_files: int = 256) -> str:
    """Materialize the amplified event stream once: events replicated
    ``amp``× with per-replica key/value/ts perturbation so parquet
    can't RLE the copies away (realistic scan volume), written as
    ``n_files`` files so the scan has enough splits to feed every core
    (the local proxy for a many-split cluster scan)."""
    from pyspark.sql import functions as F

    path = _amp_path(amp)
    if not (Path(path) / "_SUCCESS").exists():
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(n_files)
        amped = (
            ev.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(amp))))
            .withColumn("k", F.concat_ws("-", "event_type", F.col("rep") % 8))
            .withColumn("value", F.col("value") + F.col("rep") * 0.001)
            .withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros(F.col("ts").cast("timestamp")) + F.col("rep") * 1000
                ),
            )
        )
        amped.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def flagship(spark, amp: int):
    """Transcripts-shaped flagship: Source→Map→Filter→keyBy→
    Win_Seq(TB 1h/15min sliding sum+count)→sink over the materialized
    amplified stream."""
    from pyspark.sql import functions as F

    from windflow_spark.api import Pipe
    from windflow_spark.operators.windows import WinSpec, epoch_us

    ev = spark.read.parquet(_amp_path(amp))
    return (
        Pipe.source(ev)
        .map(us=epoch_us("ts"))
        .filter(F.col("value") > 0)
        .key_by("k")
        .win_seq(
            "us", WinSpec("tb", 3_600_000_000, 900_000_000),
            aggs={"cnt": F.count(F.lit(1)), "sum_value": F.sum("value")},
        )
        .df
    )


def run_single(cores: int) -> None:
    """One flagship run in this JVM; prints rows + elapsed (scaling mode).
    Scan warmed (page cache + JIT) via count; timed run measures the
    full pipeline to a noop sink."""
    spark = _spark(f"local[{cores}]", cores)
    materialize_amplified(spark, SF_DIR, AMP)
    n_in = spark.read.parquet(_amp_path(AMP)).count()
    df = flagship(spark, AMP)
    _noop(df)  # warmup: page cache + codegen JIT
    s0 = _steal_jiffies()
    el = min(_timed(df) for _ in range(3))
    print(json.dumps({"cores": cores, "rows_in": n_in, "sec": el,
                      "steal_jiffies": _steal_jiffies() - s0}))


def _timed(df) -> float:
    t0 = time.time()
    _noop(df)
    return time.time() - t0


def _steal_jiffies() -> int:
    """Hypervisor steal time from /proc/stat — this VM sees bursts of
    CPU steal that slow samples up to ~3×; reporting the delta lets a
    reader discount noisy runs (see BENCH/BASELINE.md)."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return -1


def run_stream_bench(cores: int) -> None:
    """Streaming flagship (the BASELINE.json metric): the amplified
    event stream through a watermarked sliding-window aggregate with
    RocksDB state store, drained availableNow in multi-file batches.
    Reports sustained rows/sec and p50/p99 micro-batch duration
    (window-emit latency proxy: a window is emitted in the batch whose
    watermark passes its end, so batch duration bounds emit latency)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from windflow_spark.operators.windows import WinSpec
    from windflow_spark.session import get_spark
    from windflow_spark.streaming import engine as se

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        "windflow-stream-bench", master=f"local[{cores}]",
        shuffle_partitions=cores, streaming=True,
        extra_conf={
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:NewRatio=1"
        },
    )
    materialize_amplified(spark, SF_DIR, AMP)
    src_path = _amp_path(AMP)
    n_in = spark.read.parquet(src_path).count()
    schema = spark.read.parquet(src_path).schema

    workdir = tempfile.mkdtemp(prefix="wf_stream_bench_")
    metrics = se.MetricsListener(f"{workdir}/metrics.jsonl")
    metrics.attach(spark)

    def drain(tag: str) -> float:
        src = se.stream_source(spark, src_path, schema, max_files_per_trigger=64)
        out = se.stream_win_tb(
            src.filter(F.col("value") > 0), ["k"], "ts",
            WinSpec("tb", 3600, 900),
            aggs={"cnt": F.count(F.lit(1)), "sum_value": F.sum("value")},
            watermark="30 minutes", unit="second",
        )
        t0 = time.time()
        se.run_available_now(out, f"{workdir}/sink{tag}", f"{workdir}/ckpt{tag}",
                             timeout_sec=1200)
        return time.time() - t0

    # NB: one drain per JVM — a second drain in the same JVM is SLOWER
    # (lingering RocksDB instances from the first query); main() runs
    # this subprocess twice and keeps the best
    el = drain("0")
    time.sleep(2)  # listener is async
    durs = sorted(r["batch_duration_ms"] for r in metrics.rows if r["num_input_rows"])
    emitted = spark.read.parquet(f"{workdir}/sink0").count()
    shutil.rmtree(workdir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cores": cores,
                "rows_in": n_in,
                "sec": round(el, 2),
                "sustained_rows_per_sec": round(n_in / el),
                "n_batches": len(durs),
                "p50_batch_ms": durs[len(durs) // 2] if durs else None,
                "p99_batch_ms": durs[min(len(durs) - 1, int(0.99 * len(durs)))]
                if durs
                else None,
                "windows_emitted": emitted,
                "state_store": "rocksdb",
            }
        )
    )


def main() -> None:
    if "--single" in sys.argv:
        run_single(int(sys.argv[sys.argv.index("--single") + 1]))
        return
    if "--stream" in sys.argv:
        run_stream_bench(int(sys.argv[sys.argv.index("--stream") + 1]))
        return
    do_scaling = (
        "--no-scaling" not in sys.argv
        and os.environ.get("SPARK_GRAFT_BENCH_FAST") != "1"
    )
    t_start = time.time()

    import __spark_entry__ as em

    spark = _spark(f"local[{CPUS}]", CPUS)
    qs = em.queries()
    # warmup: scan both tables + one agg so the first timed query
    # doesn't absorb JIT/page-cache costs
    for t in ("events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    _noop(qs["win_tb_tumbling"](spark, SF_DIR))
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _noop(qs[name](spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)

    # flagship throughput (amplified stream); warm once, time once —
    # the scaling section measures it more carefully in fresh JVMs
    materialize_amplified(spark, SF_DIR, AMP)
    n_in = spark.read.parquet(_amp_path(AMP)).count()
    df = flagship(spark, AMP)
    _noop(df)
    t0 = time.time()
    _noop(df)
    fl_sec = time.time() - t0
    throughput = {
        "flagship_rows_in": n_in,
        "flagship_sec": round(fl_sec, 3),
        "events_per_sec": round(n_in / fl_sec),
        "amplification": AMP,
    }
    spark.stop()

    scaling = {}
    if do_scaling:
        # VM timing noise is ±20%: take the best of 2 fresh-JVM runs per
        # size (each itself best-of-3 in-JVM) for a stable ratio
        best: dict[int, float] = {}
        steal_obs: list[int] = []
        for i, cores in enumerate((8, 32, 8, 32)):
            # second pair only if the time budget allows (guards against
            # a driver-side timeout cutting the final JSON line entirely)
            if i >= 2 and time.time() - t_start > 420:
                break
            out = subprocess.run(
                [sys.executable, __file__, "--single", str(cores)],
                capture_output=True, text=True, timeout=1200,
                cwd=str(REPO),
                env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            tput = r["rows_in"] / r["sec"]
            best[cores] = max(best.get(cores, 0.0), tput)
            steal_obs.append(r.get("steal_jiffies", -1))
        t8, t32 = best[8], best[32]
        scaling = {
            "local8_events_per_sec": round(t8),
            "local32_events_per_sec": round(t32),
            "efficiency_8_to_32": round(t32 / (4 * t8), 3),
            "steal_jiffies_per_run": steal_obs,
            "note": "hypervisor steal makes single samples read up to 3x slow; "
                    "best-of-N protocol, see BENCH/BASELINE.md",
        }

    streaming = {}
    if do_scaling:  # same gate: the expensive multi-JVM section
        for _ in range(2):  # best of 2 fresh JVMs (VM timing noise)
            out = subprocess.run(
                [sys.executable, __file__, "--stream", str(CPUS)],
                capture_output=True, text=True, timeout=1800, cwd=str(REPO),
                env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if lines:
                cand = json.loads(lines[-1])
                if not streaming or cand["sec"] < streaming["sec"]:
                    streaming = cand
            if time.time() - t_start > 420:
                break

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_battery_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": SF_DIR,
                "throughput": throughput,
                "streaming": streaming,
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
