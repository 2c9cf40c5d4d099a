"""Port of the reference's spatial_test: skyline (Pareto-dominance)
over TB sliding windows — the realistic NIC whole-window UDF
(src/spatial_test/test_spatial_wf.cpp:91-107, tuple_t.hpp:37-96).

The skyline of a window = tuples not dominated by any other tuple
(dominates = <= in every dimension, < in at least one). Output size
varies per window (0..N rows) — exercises the NIC path's multi-row
emission. Verified against a pure-python oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import oracle
from tests.conftest import assert_frames_equal
from windflow_spark.operators.windows import WinSpec, win_seq

DIM = 3


def _points(seed: int = 5, n: int = 150, keys: int = 2) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    frames = []
    for k in range(keys):
        frames.append(
            pd.DataFrame(
                {
                    "key": np.int64(k),
                    "ts": np.cumsum(rng.integers(1, 5, n)).astype(np.int64),
                    **{f"x{d}": rng.integers(0, 50, n).astype(np.int64) for d in range(DIM)},
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def test_skyline_nic_vs_oracle(spark):
    pdf = _points()
    spec = WinSpec("tb", 40, 10)
    df = spark.createDataFrame(pdf)

    # local closure: cloudpickle ships it by value to the workers
    # (tests/ is not importable there)
    def _skyline(rows: pd.DataFrame) -> pd.DataFrame:
        pts = rows[[f"x{d}" for d in range(DIM)]].to_numpy()
        keep = []
        for i in range(len(pts)):
            dominated = False
            for j in range(len(pts)):
                if i != j and (pts[j] <= pts[i]).all() and (pts[j] < pts[i]).any():
                    dominated = True
                    break
            if not dominated:
                keep.append(i)
        return rows.iloc[keep]

    def nic(g: pd.DataFrame) -> pd.DataFrame:
        sky = _skyline(g.sort_values("ts", kind="stable"))
        out = sky[["key", "gwid"] + [f"x{d}" for d in range(DIM)]].copy()
        # dedupe identical skyline points within a window for a stable
        # set comparison (duplicates are all non-dominated together)
        return out.drop_duplicates()

    got = win_seq(
        df, ["key"], "ts", spec, nic_fn=nic,
        nic_schema="key long, gwid long, x0 long, x1 long, x2 long",
        with_win_end=False,
    ).toPandas()

    def agg(w: pd.DataFrame) -> dict:
        sky = _skyline(w).drop_duplicates(subset=[f"x{d}" for d in range(DIM)])
        return {"pts": sorted(map(tuple, sky[[f"x{d}" for d in range(DIM)]].to_numpy()))}

    want_rows = []
    ow = oracle.windowed_agg(pdf, ["key"], "ts", 40, 10, agg)
    for _, r in ow.iterrows():
        for p in r["pts"]:
            want_rows.append({"key": r["key"], "gwid": r["gwid"],
                              **{f"x{d}": p[d] for d in range(DIM)}})
    want = pd.DataFrame(want_rows)
    got = got.drop_duplicates()
    assert_frames_equal(got, want, ["key", "gwid", "x0", "x1", "x2"])
