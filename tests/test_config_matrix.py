"""The reference's 30-config agreement matrix, Spark-shaped
(src/sum_test_cpu/test_all_cb.cpp:161-825): every execution
configuration of the same windowed-sum query must produce the same
total sum — here, identical full result sets across plan variants,
UDF forms, parallelism, and composition styles, on the exact reference
fixture parameters (FIXTURES.md F2: len=1000 keys=4 win=16 slide=4).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

import datagen
import oracle
from tests.conftest import assert_frames_equal
from windflow_spark.api import Pipe
from windflow_spark.operators.pane_farm import pane_farm, sliding_agg
from windflow_spark.operators.win_mapreduce import win_mapreduce
from windflow_spark.operators.windows import WinSpec, win_seq


@pytest.mark.parametrize("kind", ["cb", "tb"])
def test_all_configs_agree(spark, kind):
    pdf = (
        datagen.gen_cb_grid(length=1000, keys=4)
        if kind == "cb"
        else datagen.gen_tb_grid(length=1000, keys=4, seed=0)
    )
    unit = "id" if kind == "cb" else "ts"
    spec = WinSpec(kind, 16, 4)
    df = spark.createDataFrame(pdf)
    inc = {"sum_value": F.sum("value"), "cnt": F.count(F.lit(1))}
    partial = {"p_s": F.sum("value"), "p_c": F.count(F.lit(1))}
    merge = {"sum_value": F.sum("p_s"), "cnt": F.sum("p_c")}

    def nic(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": [g["key"].iloc[0]],
                "gwid": [g["gwid"].iloc[0]],
                "sum_value": [g["value"].sum()],
                "cnt": [len(g)],
            }
        )

    configs = {
        "win_seq_inc": lambda d: win_seq(d, ["key"], unit, spec, aggs=inc),
        "win_seq_nic": lambda d: win_seq(
            d, ["key"], unit, spec, nic_fn=nic,
            nic_schema="key long, gwid long, sum_value long, cnt long",
        ),
        "pane_farm": lambda d: pane_farm(d, ["key"], unit, spec, partial, merge),
        "win_mapreduce_d2": lambda d: win_mapreduce(
            d, ["key"], unit, spec, partial, merge, degree=2
        ),
        "win_mapreduce_d7": lambda d: win_mapreduce(
            d, ["key"], unit, spec, partial, merge, degree=7
        ),
        "sliding_agg_router": lambda d: sliding_agg(
            d, ["key"], unit, spec,
            {"sum_value": ("sum", "value"), "cnt": ("count", "value")},
            pane_threshold=2,  # force the pane route
        ),
        "pipe_chained": lambda d: Pipe.source(d)
        .key_by("key")
        .win_seq(unit, spec, aggs=inc)
        .df,
        "repartitioned_13": lambda d: win_seq(
            d.repartition(13), ["key"], unit, spec, aggs=inc
        ),
    }
    want = oracle.windowed_agg(
        pdf, ["key"], unit, 16, 4,
        lambda w: {"sum_value": w["value"].sum(), "cnt": len(w)},
    )
    total = want["sum_value"].sum()
    for name, build in configs.items():
        got = build(df).toPandas()
        # the reference's invariant: identical total across configs
        assert got["sum_value"].sum() == total, name
        # stronger: full row-for-row agreement with the oracle
        cols = ["key", "gwid", "sum_value", "cnt"]
        assert_frames_equal(got[cols], want[cols], ["key", "gwid"])
