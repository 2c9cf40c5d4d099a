"""Basic operator suite (mirror of src/{map,filter,flatmap,accumulator}_test/
and the micro-1 stateless pipeline, FIXTURES.md F5)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

import oracle
from tests.conftest import assert_frames_equal
from windflow_spark.api import Pipe
from windflow_spark.operators import core
from windflow_spark.operators.core import accumulate, filter_, flat_map, map_


def test_map_filter_flatmap_micro1(spark, cb_grid):
    """F5: Map value+1; Filter id%2==0; FlatMap ×2 copies (value*2, value*3).
    Expected count = keys*len/2*2 (test_micro_1.cpp:96-136)."""
    df = spark.createDataFrame(cb_grid)
    out = flat_map(
        filter_(map_(df, value=F.col("value") + 1), F.col("id") % 2 == 0),
        F.array(F.col("value") * 2, F.col("value") * 3),
        alias="out_value",
        keep=["key", "id"],
    ).toPandas()
    keys = cb_grid["key"].nunique()
    length = cb_grid["id"].max() + 1
    assert len(out) == keys * length // 2 * 2
    # spot-check: id=4 → value=5 → emits 10 and 15
    vals = sorted(out[(out.key == 0) & (out.id == 4)]["out_value"])
    assert vals == [10, 15]


def test_flatmap_zero_emissions(spark):
    """Shipper with 0 emissions drops the row (shipper.hpp:63-77)."""
    df = spark.createDataFrame(pd.DataFrame({"x": [1, 2, 3]}))
    out = flat_map(
        df, F.when(F.col("x") % 2 == 0, F.array(F.col("x"))).otherwise(F.array().cast("array<long>")),
        alias="y", keep=["x"],
    ).toPandas()
    assert out["x"].tolist() == [2]


def test_accumulator_vs_oracle(spark, cb_grid):
    """F4: running per-key sum, one output per input
    (accumulator.hpp:157-192)."""
    df = spark.createDataFrame(cb_grid)
    got = accumulate(df, ["key"], ["id"], {"running": F.sum("value")}).toPandas()
    want = oracle.rolling_reduce(cb_grid, ["key"], ["id"], "value", "sum")
    assert len(got) == len(cb_grid)
    assert_frames_equal(got, want, ["key", "id"])


def test_per_turn_text_equality(spark, transcripts):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — Map rewrites text deterministically."""
    df = spark.createDataFrame(transcripts)
    got = (
        map_(df, text=F.upper("text"))
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    want = transcripts.sort_values(["conv_id", "turn_idx"], kind="stable")
    assert got["text"].tolist() == want["text"].str.upper().tolist()


def test_pipe_fluent_chain(spark, transcripts):
    """MultiPipe composition: source→map→filter→key_by→win_seq→ordered."""
    from windflow_spark.operators.windows import WinSpec

    df = spark.createDataFrame(transcripts)
    out = (
        Pipe.source(df)
        .map(text_len=F.length("text"))
        .filter(F.col("role") != "tool")
        .key_by("conv_id")
        .win_seq("turn_idx", WinSpec("cb", 8, 8), aggs={"sum_len": F.sum("text_len")})
        .ordered("conv_id", "gwid")
        .collect_pandas()
    )
    assert len(out) > 0
    assert list(out.columns) == ["conv_id", "gwid", "sum_len", "win_end"]
    # ordered emission: sorted by (conv_id, gwid)
    assert out.equals(out.sort_values(["conv_id", "gwid"], kind="stable").reset_index(drop=True))


def test_union_pipes(spark, cb_grid):
    """unionMultiPipes (multipipe.hpp:901-940): even/odd generator merge
    (union_test analogue)."""
    df = spark.createDataFrame(cb_grid)
    even = Pipe.source(df.filter(F.col("id") % 2 == 0))
    odd = Pipe.source(df.filter(F.col("id") % 2 == 1))
    merged = even.union_(odd).collect_pandas()
    assert len(merged) == len(cb_grid)
    assert merged["value"].sum() == cb_grid["value"].sum()


def test_custom_key_routing(spark, cb_grid):
    """Pluggable routing (builders.hpp:190 routing_func_t analogue):
    rows with equal routing values co-locate in one partition, and a
    salted routing splits a key across partitions while the downstream
    keyed aggregate stays correct (Spark re-exchanges on the key)."""
    df = spark.createDataFrame(cb_grid)
    routed = core.key_by(df, "key", routing=F.pmod(F.col("id"), F.lit(3)),
                         num_partitions=3)
    per_part = (
        routed.withColumn("p", F.spark_partition_id())
        .groupBy((F.col("id") % 3).alias("r"))
        .agg(F.countDistinct("p").alias("nparts"))
        .toPandas()
    )
    assert (per_part["nparts"] == 1).all(), per_part
    # salted routing + keyed agg: result equals the unsalted plan
    got = (
        Pipe.source(df).key_by("key", routing=F.concat_ws("-", "key", (F.col("id") % 4).cast("string")), num_partitions=4)
        .df.groupBy("key").agg(F.sum("value").alias("s")).toPandas()
        .sort_values("key").reset_index(drop=True)
    )
    want = df.groupBy("key").agg(F.sum("value").alias("s")).toPandas().sort_values("key").reset_index(drop=True)
    assert got.equals(want)


def test_pipe_pane_farm_and_win_mapreduce_methods(spark, cb_grid):
    """Fluent Pipe.pane_farm / Pipe.win_mapreduce / Pipe.sliding_agg ==
    win_seq direct (regression: the operators package __init__ shadows
    the pane_farm/win_mapreduce module names with their functions, which
    silently broke these methods' module references)."""
    from windflow_spark.operators.windows import WinSpec, win_seq

    df = spark.createDataFrame(cb_grid)
    spec = WinSpec("tb", 16, 4)
    want = (
        win_seq(df, ["key"], "id", spec, aggs={"s": F.sum("value")})
        .toPandas()
    )
    base = Pipe.source(df).key_by("key")
    for p in (
        base.pane_farm("id", spec, partial_aggs={"p": F.sum("value")},
                       merge_aggs={"s": F.sum("p")}),
        base.win_mapreduce("id", spec, partial_aggs={"p": F.sum("value")},
                           merge_aggs={"s": F.sum("p")}, degree=4),
        base.sliding_agg("id", spec, aggs={"s": ("sum", "value")}),
    ):
        got = p.df.toPandas()
        assert_frames_equal(got[["key", "gwid", "s"]],
                            want[["key", "gwid", "s"]], ["key", "gwid"])


def test_drop_regressions_matches_sequential_rule(spark):
    """Batch out-of-order drop == the reference's sequential per-key
    scan (win_seq.hpp:289-305): consume rows in arrival order, keep a
    row iff its ts strictly advances the per-key max; regressions AND
    duplicates drop. Fixture is deliberately shuffled so the no-ordered-
    input assumption is exercised."""
    import numpy as np

    rng = np.random.default_rng(11)
    n = 400
    pdf = pd.DataFrame(
        {
            "key": rng.integers(0, 3, n),
            "ts": rng.integers(0, 120, n),
            "arrival": rng.permutation(n),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        core.drop_regressions(df, ["key"], "ts", ["arrival"])
        .toPandas()
        .sort_values(["key", "arrival"])
        .reset_index(drop=True)
    )
    # reference rule: single-threaded scan in arrival order
    kept_rows = []
    last: dict[int, int] = {}
    for _, r in pdf.sort_values("arrival").iterrows():
        if r["ts"] > last.get(r["key"], -1):
            last[r["key"]] = r["ts"]
            kept_rows.append(r)
    want = (
        pd.DataFrame(kept_rows)
        .sort_values(["key", "arrival"])
        .reset_index(drop=True)
        .astype(pdf.dtypes)
    )
    assert got[["key", "ts", "arrival"]].equals(want[["key", "ts", "arrival"]])


def test_drop_regressions_then_window_is_order_insensitive(spark):
    """The combinator closes SURVEY §4.2's gap: shuffling the input rows
    does not change the windows computed downstream of the drop."""
    import numpy as np

    from windflow_spark.operators.windows import WinSpec, win_seq

    rng = np.random.default_rng(3)
    n = 300
    pdf = pd.DataFrame(
        {
            "key": rng.integers(0, 2, n),
            "ts": rng.integers(0, 64, n),
            "arrival": rng.permutation(n),
            "value": rng.normal(size=n).round(3),
        }
    )
    def windows_of(frame):
        df = spark.createDataFrame(frame)
        kept = core.drop_regressions(df, ["key"], "ts", ["arrival"])
        return (
            win_seq(kept, ["key"], "ts", WinSpec("tb", 16, 16),
                    aggs={"s": F.round(F.sum("value"), 3)})
            .toPandas().sort_values(["key", "gwid"]).reset_index(drop=True)
        )

    assert windows_of(pdf).equals(
        windows_of(pdf.sample(frac=1.0, random_state=9).reset_index(drop=True))
    )


def test_map_pandas_rich_runtime_context(spark):
    """"Rich" UDF variant (reference context.hpp:45-82): the UDF sees a
    RuntimeContext with its replica index (== task partition id) and the
    declared replica count; rows processed by one task all report the
    same replica, and indexes cover [0, n)."""
    pdf = pd.DataFrame({"x": range(1000)})
    df = core.key_by(spark.createDataFrame(pdf), "x", num_partitions=4)

    def fn(ctx, batches):
        for b in batches:
            yield pd.DataFrame(
                {
                    "x": b["x"],
                    "replica": ctx.replica_index,
                    "n_replicas": ctx.num_replicas,
                }
            )

    out = core.map_pandas_rich(
        df, fn, "x long, replica int, n_replicas int", num_replicas=4
    ).toPandas()
    assert len(out) == 1000
    assert set(out["n_replicas"]) == {4}
    assert set(out["replica"]) <= set(range(4)) and out["replica"].nunique() > 1


def test_pipe_drop_regressions_fluent(spark):
    """Fluent surface: Pipe.key_by(...).drop_regressions(...) == the
    combinator on the same key."""
    pdf = pd.DataFrame(
        {"k": [0, 0, 0, 1, 1], "ts": [5, 3, 7, 2, 2], "arr": [0, 1, 2, 0, 1]}
    )
    df = spark.createDataFrame(pdf)
    got = (
        Pipe.source(df).key_by("k").drop_regressions("ts", ["arr"])
        .df.toPandas().sort_values(["k", "arr"]).reset_index(drop=True)
    )
    # k=0: 5 kept, 3 regresses, 7 kept; k=1: 2 kept, duplicate 2 drops
    assert list(zip(got["k"], got["ts"])) == [(0, 5), (0, 7), (1, 2)]


def test_drop_regressions_preserves_existing_prev_max_column(spark):
    """An input that already carries a `_prev_max` column must survive
    untouched (ADVICE r3: the temp column previously shadowed and then
    dropped it)."""
    pdf = pd.DataFrame(
        {
            "key": [1, 1, 1],
            "ts": [10, 5, 20],
            "arrival": [0, 1, 2],
            "_prev_max": [7.0, 8.0, 9.0],
        }
    )
    got = (
        core.drop_regressions(
            spark.createDataFrame(pdf), ["key"], "ts", ["arrival"]
        )
        .toPandas()
        .sort_values("arrival")
        .reset_index(drop=True)
    )
    assert "_prev_max" in got.columns
    # ts=5 regresses after ts=10 → dropped; user column values intact
    assert got["ts"].tolist() == [10, 20]
    assert got["_prev_max"].tolist() == [7.0, 9.0]
