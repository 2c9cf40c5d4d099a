"""Pane_Farm: pane-decomposed sliding-window aggregation.

Reference (includes/pane_farm.hpp:57-590): sliding-only (asserts
``win > slide``, :142-146); ``pane_len = gcd(win, slide)`` (:148);
stage 1 (PLQ) computes per-pane partials as tumbling windows
``win = slide = pane_len`` (:152-163); stage 2 (WLQ) combines
``win/pane`` consecutive pane results per window as a CB window
``(win/pane, slide/pane)`` (:165-176). Panes shared by overlapping
windows are computed once (:26-31).

Spark shape: two hash aggregates —
``groupBy(key, pane_id).agg(partials)`` → ``groupBy(key, gwid).agg(merge)``.
This is the skew weapon for hot keys at 100 TB scale: a hot key's rows
are pre-shrunk to one row per pane BEFORE the (key, gwid) exchange, so
the skewed shuffle moves O(windows) rows instead of O(tuples). It also
removes the sliding-window row amplification (no ceil(win/slide)×
explode of raw rows — only tiny pane partials are replicated).

Only valid for decomposable (semigroup) aggregates — the same
constraint the reference imposes on PLQ/WLQ UDF pairs.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from windflow_spark.operators.windows import GWID, WinSpec, assign_wids, win_end_expr


def pane_farm(
    df: DataFrame,
    keys: Sequence[str],
    unit_col: Column | str,
    spec: WinSpec,
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    origin: int = 0,
    with_win_end: bool = True,
) -> DataFrame:
    """Two-level pane aggregation, output-identical to ``win_seq`` INC.

    ``partial_aggs``: per-pane aggregates over the input columns
    (PLQ UDF analogue). ``merge_aggs``: per-window aggregates over the
    pane-partial columns (WLQ UDF analogue), referencing the names
    produced by ``partial_aggs``. E.g. sum: partial ``{"p_sum":
    F.sum("value")}`` merge ``{"sum_value": F.sum("p_sum")}``; count:
    partial count → merge sum of counts.
    """
    if spec.win <= spec.slide:
        raise ValueError(
            "pane_farm requires a sliding window (win > slide) — "
            "reference asserts the same (includes/pane_farm.hpp:142-146)"
        )
    pane = math.gcd(spec.win, spec.slide)
    t = (F.expr(unit_col) if isinstance(unit_col, str) else unit_col).cast("long") - F.lit(origin)
    # PLQ: tumbling panes win=slide=pane_len (includes/pane_farm.hpp:152-163)
    panes = (
        df.withColumn("_pane", F.floor(t / F.lit(pane)))
        .groupBy(*keys, "_pane")
        .agg(*[c.alias(n) for n, c in partial_aggs.items()])
    )
    # WLQ: CB window (win/pane, slide/pane) over pane ids
    # (includes/pane_farm.hpp:165-176)
    wlq_spec = WinSpec("cb", spec.win // pane, spec.slide // pane)
    out = (
        assign_wids(panes, "_pane", wlq_spec)
        .groupBy(*keys, GWID)
        .agg(*[c.alias(n) for n, c in merge_aggs.items()])
    )
    if with_win_end:
        out = out.withColumn("win_end", win_end_expr(spec, origin=origin))
    return out
