"""Property-based sampling invariants: for ANY weight/rate/k/budget
configuration the deterministic-sampling family preserves its
contracts — splits partition the input, salted two-stage rank equals
the one-stage rank, packed bins respect the first-fit bound.

One Spark job per example; the pure-threshold algebra is checked
Spark-free with a wider example budget.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import assert_frames_equal
from windflow_spark.functions import sampling

WEIGHTS = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d"]),
    st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
    min_size=1,
    max_size=4,
).filter(lambda d: sum(d.values()) > 0)


@given(WEIGHTS)
@settings(max_examples=200, deadline=None)
def test_split_thresholds_properties(weights):
    th = sampling.split_thresholds(weights)
    names = [n for n, _ in th]
    vals = [v for _, v in th]
    assert names == list(weights)          # insertion order preserved
    assert vals == sorted(vals)            # monotone
    assert vals[-1] == 1.0                 # residual mass absorbed
    assert all(0.0 <= v <= 1.0 for v in vals)


@pytest.fixture(scope="module")
def small(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "id": np.arange(300, dtype=np.int64),
            "key": rng.choice(["x", "y", "z"], size=300),
            "tok": rng.integers(1, 50, size=300).astype(np.int64),
        }
    )
    return spark.createDataFrame(pdf)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=WEIGHTS,
    k=st.integers(min_value=1, max_value=40),
    parts=st.integers(min_value=0, max_value=6),
    budget=st.integers(min_value=1, max_value=400),
    salt=st.sampled_from(["", "s1", "s2"]),
    span=st.integers(min_value=1, max_value=400),
)
def test_sampling_contracts_hold(small, weights, k, parts, budget, salt, span):
    # split partitions the input: every row in exactly one split
    split = sampling.hash_split(small, "id", weights, salt=salt)
    got = split.groupBy("split").count().toPandas()
    assert got["count"].sum() == 300
    assert set(got["split"]) <= set(weights)

    # salted two-stage k-per-key == one-stage (min-k decomposability)
    plain = sampling.sample_k_per_key(small, "key", k, "id", salt=salt)
    salted = sampling.sample_k_per_key(
        small, "key", k, "id", salt=salt, salt_parts=parts
    )
    assert_frames_equal(
        plain.select("key", "id").toPandas(),
        salted.select("key", "id").toPandas(),
        ["key", "id"],
    )
    sizes = plain.groupBy("key").count().toPandas()
    per_key = small.groupBy("key").count().toPandas().set_index("key")["count"]
    for _, r in sizes.iterrows():
        assert r["count"] == min(k, per_key[r["key"]])

    # packing: first-fit bound and contiguous bins per key
    packed = sampling.pack_sequences(small, "id", "tok", budget, key_col="key")
    agg = (
        packed.groupBy("key", "bin_id")
        .agg(F.sum("tok").alias("s"), F.max("tok").alias("m"))
        .toPandas()
    )
    assert (agg["s"] < budget + agg["m"]).all()
    # dense=True is always contiguous from 0, for ANY budget; one extra
    # Window over the same partitioning (no extra exchange)
    dense = sampling.pack_sequences(
        small, "id", "tok", budget, key_col="key", dense=True
    )
    dagg = dense.groupBy("key", "bin_id").count().toPandas()
    for _, g in dagg.groupby("key"):
        bins = sorted(g["bin_id"])
        assert bins == list(range(len(bins)))
    plan = dense._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # bucketed two-pass prefix-sum layout == single-window layout for
    # ANY coarsening span of the layout order, plain and dense (span 1
    # = one bucket per row; span 400 = one bucket total)
    from windflow_spark.operators.windows import floordiv

    b = small.withColumn("_bk", floordiv(F.col("id"), span))
    for dense_flag in (False, True):
        want = sampling.pack_sequences(
            b, "id", "tok", budget, key_col="key", dense=dense_flag
        )
        got = sampling.pack_sequences(
            b, "id", "tok", budget, key_col="key", dense=dense_flag,
            bucket_col="_bk",
        )
        assert_frames_equal(
            got.select("id", "bin_id").toPandas(),
            want.select("id", "bin_id").toPandas(),
            ["id"],
        )

    max_tok = 49  # _stream fixture bound
    for _, g in agg.groupby("key"):
        bins = sorted(g["bin_id"])
        assert len(set(bins)) == len(bins) and bins[0] == 0
        if budget >= max_tok:
            # every doc fits the budget -> bins contiguous from 0
            assert bins == list(range(len(bins)))
        else:
            # oversized docs skip bins but never collide or go back:
            # each bin still satisfies the first-fit bound (above)
            assert all(b >= 0 for b in bins)
