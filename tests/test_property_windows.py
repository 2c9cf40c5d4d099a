"""Property-based window-algebra tests: for ANY (win, slide) spec and
any small integer stream, the engine matches the pandas oracle
row-for-row and the pane/salt rewrites match the direct plan.

Hypothesis drives the spec space (tumbling/sliding/hopping emerge from
win vs slide); examples are kept small since each case is a Spark job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import oracle
from tests.conftest import assert_frames_equal
from windflow_spark.operators.pane_farm import pane_farm
from windflow_spark.operators.win_mapreduce import win_mapreduce
from windflow_spark.operators.windows import WinSpec, win_seq

SPECS = st.tuples(
    st.integers(min_value=1, max_value=25),  # win
    st.integers(min_value=1, max_value=25),  # slide
)


def _stream(seed: int, n: int = 120, keys: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    gaps = rng.integers(1, 7, size=n)
    frames = []
    for k in range(keys):
        frames.append(
            pd.DataFrame(
                {
                    "key": np.int64(k),
                    "t": np.cumsum(rng.integers(1, 7, size=n)).astype(np.int64),
                    "value": rng.integers(0, 100, size=n).astype(np.int64),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=SPECS, seed=st.integers(min_value=0, max_value=10**6))
def test_win_seq_matches_oracle_any_spec(spark, spec, seed):
    win, slide = spec
    pdf = _stream(seed)
    df = spark.createDataFrame(pdf)
    got = win_seq(
        df, ["key"], "t", WinSpec("tb", win, slide),
        aggs={"sum_value": F.sum("value"), "cnt": F.count(F.lit(1))},
    ).toPandas()
    want = oracle.windowed_agg(
        pdf, ["key"], "t", win, slide,
        lambda w: {"sum_value": w["value"].sum(), "cnt": len(w)},
    )
    if len(want) == 0:
        assert len(got) == 0
        return
    assert_frames_equal(got, want, ["key", "gwid"])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    win_mult=st.integers(min_value=2, max_value=8),
    slide=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_rewrites_match_direct_any_sliding_spec(spark, win_mult, slide, seed):
    """Pane_Farm and salted Win_MapReduce are plan rewrites — identical
    output to win_seq for every sliding spec (win = mult×slide keeps it
    sliding, the reference's own precondition)."""
    win = win_mult * slide
    spec = WinSpec("tb", win, slide)
    pdf = _stream(seed, n=80)
    df = spark.createDataFrame(pdf)
    base = win_seq(
        df, ["key"], "t", spec,
        aggs={"sum_value": F.sum("value"), "cnt": F.count(F.lit(1))},
    ).toPandas()
    pf = pane_farm(
        df, ["key"], "t", spec,
        {"p_s": F.sum("value"), "p_c": F.count(F.lit(1))},
        {"sum_value": F.sum("p_s"), "cnt": F.sum("p_c")},
    ).toPandas()
    wm = win_mapreduce(
        df, ["key"], "t", spec,
        {"p_s": F.sum("value"), "p_c": F.count(F.lit(1))},
        {"sum_value": F.sum("p_s"), "cnt": F.sum("p_c")},
        degree=3,
    ).toPandas()
    assert_frames_equal(pf, base, ["key", "gwid"])
    assert_frames_equal(wm, base, ["key", "gwid"])


def test_assign_wids_integer_exact_near_2pow60(spark):
    """Window id math must be integral end-to-end: F.floor(t/slide)
    through DOUBLE is lossy past 2^53 (silent off-by-one wids for
    nanosecond-unit callers). floordiv (pmod + integral div) must match
    Python's arbitrary-precision floor division at |t| ~ 2^60, both
    signs, tumbling and sliding (VERDICT r5 #7)."""
    from windflow_spark.operators.windows import GWID, assign_wids

    base = 2**60
    ts = [base + d for d in range(-3, 4)] + [-base + d for d in range(-3, 4)]
    slide, win = 7, 21
    pdf = pd.DataFrame({"t": np.array(ts, dtype=np.int64)})
    df = spark.createDataFrame(pdf)

    got = (
        assign_wids(df, "t", WinSpec("tb", slide, slide))
        .select("t", GWID).toPandas().sort_values("t").reset_index(drop=True)
    )
    want = sorted((t, t // slide) for t in ts)
    assert list(map(tuple, got.itertuples(index=False))) == want

    got_s = (
        assign_wids(df, "t", WinSpec("tb", win, slide))
        .select("t", GWID).toPandas()
        .sort_values(["t", GWID]).reset_index(drop=True)
    )
    want_s = sorted(
        (t, w)
        for t in ts
        for w in range(max(0, (t - win) // slide + 1), t // slide + 1)
    )
    assert list(map(tuple, got_s.itertuples(index=False))) == want_s
