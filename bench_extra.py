"""Round-8 optimization harness — SUPPLEMENTARY to the frozen bench.py
(the driver times rounds with the round-start bench.py; this file only
exists so optimization work can iterate on subsets and capture
evidence; its numbers are cited in OPTIMIZATION_r08.md).

Modes:
  python bench_extra.py battery [sf_dir] [query ...]
      Per-query wall times with the SAME protocol as bench.py's
      battery (shared warm JVM, noop sink, steal-stamped best-of-4
      reps with the warm-up cutoff) so numbers are comparable.
  python bench_extra.py plans <outdir> [sf_dir] [query ...]
      Write `.explain("formatted")` of each query to
      <outdir>/<query>.txt (the judge's plan-claim evidence).
  python bench_extra.py stream <cores> [reps]
      Steal-stamped streaming drain (VERDICT r7 #1): the exact
      bench.py --stream drain, but each rep records /proc/stat steal
      around it and the kept rep must be steal-clean (mirrors
      run_battery's queries_steal_jiffies protocol). One drain per
      fresh JVM via subprocess, like bench.py's runner.
  python bench_extra.py stream-one <cores>
      Internal: single drain in this JVM (called by `stream`).
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
STEAL_CAP = 500


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return -1


def _spark(parts: int = CPUS):
    from windflow_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    return get_spark(
        "windflow-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=parts,
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "64MB",
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:NewRatio=1",
        },
    )


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def battery(sf_dir: str, names: list[str]) -> None:
    import __spark_entry__ as em

    spark = _spark()
    qs = em.queries()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    for t in ("events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    _noop(qs[names[0]](spark, sf_dir))
    times: dict[str, float] = {}
    steals: dict[str, int] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        reps: list[tuple[float, int]] = []
        for i in range(4):
            s0 = _steal()
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            el = time.time() - t0
            reps.append((el, _steal() - s0))
            if (
                i >= 1
                and any(st < STEAL_CAP for _, st in reps)
                and reps[-1][0] > 0.8 * reps[-2][0]
            ):
                break
        clean = [r for r in reps if r[1] < STEAL_CAP]
        el, st = min(clean or reps)
        times[name] = round(el, 3)
        steals[name] = st
        print(json.dumps({"q": name, "sec": times[name], "steal": st,
                          "reps": [round(r[0], 3) for r in reps]}), flush=True)
    print(json.dumps({"total": round(sum(times.values()), 3),
                      "queries": times, "sf": sf_dir}), flush=True)


def plans(outdir: str, sf_dir: str, names: list[str]) -> None:
    import __spark_entry__ as em

    spark = _spark()
    qs = em.queries()
    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out / f"{name}.txt").write_text(
            f"# {name} @ {sf_dir} — explain('formatted')\n\n{txt}"
        )
        print(f"wrote {out / f'{name}.txt'}", flush=True)


def skew(reps: int = 3) -> None:
    """Zipf-hot-key head-to-head (VERDICT r7 #7): the amplified sf
    event stream re-keyed so ONE key carries ~50% of all rows, run
    through (a) the DIRECT sliding top-k (assign_wids explode +
    whole-group collect_list slice) vs (b) the pane_topk router
    (per-pane pre-top-k, ≤ k structs per (key, pane) cross the
    (key, gwid) exchange), and (c) direct single-stage sliding
    sum/count vs (d) the salted win_mapreduce two-stage. Outputs are
    asserted identical pairwise; the timing shows what the routers buy
    on skewed data. bench.py is frozen, so this lives here; numbers go
    to NOTES.md."""
    import bench
    from pyspark.sql import functions as F

    from windflow_spark.operators.pane_farm import pane_topk
    from windflow_spark.operators.win_mapreduce import win_mapreduce
    from windflow_spark.operators.windows import (
        WinSpec, epoch_us, win_seq, windowed_topk,
    )

    spark = _spark()
    bench.materialize_amplified(spark, SF_DIR, bench.AMP)
    ev = (
        spark.read.parquet(bench._amp_path(bench.AMP))
        .withColumn("us", epoch_us("ts"))
        .withColumn(
            # deterministic Zipf-ish: ~50% of rows land on one hot key,
            # the rest spread over 64 cold keys
            "zk",
            F.when(F.pmod(F.xxhash64("event_id"), F.lit(2)) == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.pmod(F.col("user_id"), F.lit(64)))),
        )
    )
    spec = WinSpec("tb", 3_600_000_000, 900_000_000)
    pairs = {
        "topk_direct": windowed_topk(
            ev, ["zk"], "us", spec, order_col="value",
            payload=["event_id", "value"], k=3,
        ).select("zk", "gwid", "rnk", "event_id", "value"),
        "topk_pane": pane_topk(
            ev, ["zk"], "us", spec, order_col="value", id_col="event_id", k=3
        ).select("zk", "gwid", "rnk", "event_id", "value"),
        "agg_direct": win_seq(
            ev, ["zk"], "us", spec,
            aggs={"cnt": F.count(F.lit(1)), "s": F.round(F.sum("value"), 2)},
        ),
        "agg_mapreduce": win_mapreduce(
            ev, ["zk"], "us", spec,
            partial_aggs={"p_cnt": F.count(F.lit(1)), "p_s": F.sum("value")},
            merge_aggs={"cnt": F.sum("p_cnt"), "s": F.round(F.sum("p_s"), 2)},
            degree=8,
        ),
    }
    times: dict[str, float] = {}
    for name, df in pairs.items():
        spark.sparkContext.setJobDescription(f"skew: {name}")
        _noop(df)
        r = []
        for _ in range(reps):
            s0 = _steal()
            t0 = time.time()
            _noop(df)
            r.append((round(time.time() - t0, 3), _steal() - s0))
        clean = [x for x in r if x[1] < STEAL_CAP]
        times[name] = min(clean or r)[0]
        print(json.dumps({"q": name, "sec": times[name], "reps": r}), flush=True)
    # parity: routed == direct, row for row
    a = pairs["topk_direct"].exceptAll(pairs["topk_pane"]).count()
    b = pairs["topk_pane"].exceptAll(pairs["topk_direct"]).count()
    c = pairs["agg_direct"].exceptAll(pairs["agg_mapreduce"]).count()
    d = pairs["agg_mapreduce"].exceptAll(pairs["agg_direct"]).count()
    print(json.dumps({"times": times, "parity_topk": a + b == 0,
                      "parity_agg": c + d == 0, "hot_share": 0.5,
                      "rows_in": spark.read.parquet(
                          bench._amp_path(bench.AMP)).count()}), flush=True)


def stream_one(cores: int) -> None:
    """Single drain in this JVM — bench.py run_stream_bench's drain,
    reproduced verbatim (same source, same operator, same RocksDB
    session), emitting the same JSON line."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    import bench
    from windflow_spark.operators.windows import WinSpec
    from windflow_spark.session import get_spark
    from windflow_spark.streaming import engine as se

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        "windflow-stream-extra", master=f"local[{cores}]",
        shuffle_partitions=cores, streaming=True,
        extra_conf={
            "spark.driver.extraJavaOptions": "-XX:+UseParallelGC -XX:NewRatio=1"
        },
    )
    bench.materialize_amplified(spark, SF_DIR, bench.AMP)
    src_path = bench._amp_path(bench.AMP)
    n_in = spark.read.parquet(src_path).count()
    schema = spark.read.parquet(src_path).schema
    workdir = tempfile.mkdtemp(prefix="wf_stream_extra_")
    metrics = se.MetricsListener(f"{workdir}/metrics.jsonl")
    metrics.attach(spark)
    src = se.stream_source(spark, src_path, schema, max_files_per_trigger=32)
    out = se.stream_win_tb(
        src.filter(F.col("value") > 0), ["k"], "ts",
        WinSpec("tb", 3600, 900),
        aggs={"cnt": F.count(F.lit(1)), "sum_value": F.sum("value")},
        watermark="30 minutes", unit="second",
    )
    t0 = time.time()
    se.run_available_now(out, f"{workdir}/sink0", f"{workdir}/ckpt0",
                         timeout_sec=1200)
    el = time.time() - t0
    time.sleep(2)
    durs = sorted(r["batch_duration_ms"] for r in metrics.rows if r["num_input_rows"])
    emitted = spark.read.parquet(f"{workdir}/sink0").count()
    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps({
        "cores": cores, "rows_in": n_in, "sec": round(el, 2),
        "sustained_rows_per_sec": round(n_in / el),
        "n_batches": len(durs),
        "p50_batch_ms": durs[len(durs) // 2] if durs else None,
        "p99_batch_ms": durs[min(len(durs) - 1, int(0.99 * len(durs)))] if durs else None,
        "windows_emitted": emitted,
    }), flush=True)


def stream(cores: int, reps: int = 3) -> None:
    """Steal-stamped drain protocol (VERDICT r7 #1): N fresh-JVM drains,
    each stamped with the /proc steal delta across its subprocess; keep
    the best steal-clean rep (cap 1000 jiffies over the whole drain,
    the scaling-pair cap — a drain runs ~minutes, not seconds). Extra
    reps run while no clean rep exists, up to 2·reps."""
    samples = []
    i = 0
    while i < 2 * reps and (
        i < reps or not any(s["steal"] < 1000 for s in samples)
    ):
        i += 1
        s0 = _steal()
        out = subprocess.run(
            [sys.executable, __file__, "stream-one", str(cores)],
            capture_output=True, text=True, timeout=1800, cwd=str(REPO),
            env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
        )
        st = _steal() - s0
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(json.dumps({"rep": i, "steal": st, "err": out.stderr[-300:]}),
                  flush=True)
            continue
        r = json.loads(lines[-1])
        r["steal"] = st
        samples.append(r)
        print(json.dumps({"rep": i, **r}), flush=True)
    clean = [s for s in samples if s["steal"] < 1000]
    best = max(clean or samples, key=lambda s: s["sustained_rows_per_sec"])
    print(json.dumps({"best": best, "n_clean": len(clean),
                      "n_samples": len(samples), "steal_cap": 1000}), flush=True)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "battery"
    if mode == "battery":
        sf = sys.argv[2] if len(sys.argv) > 2 else SF_DIR
        battery(sf, sys.argv[3:])
    elif mode == "plans":
        outdir = sys.argv[2]
        sf = sys.argv[3] if len(sys.argv) > 3 else SF_DIR
        plans(outdir, sf, sys.argv[4:])
    elif mode == "skew":
        skew(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    elif mode == "stream":
        stream(int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif mode == "stream-one":
        stream_one(int(sys.argv[2]))
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
