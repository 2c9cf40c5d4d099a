"""Pure-pandas oracle for the engine's window semantics (SURVEY.md §5.1).

Implements the reference's window algebra directly from the formulas —
window ``w`` covers units ``[w*slide, w*slide+win)``
(includes/window.hpp:49-88), hopping discard (includes/win_seq.hpp:326-338),
EOS partial-window flush (includes/win_seq.hpp:432-474), result stamp
``w*slide+win-1`` (includes/window.hpp:120-124) — with NO Spark code, so
engine bugs can't leak into the expectation.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd


def wid_range(t: int, win: int, slide: int) -> range:
    """Window ids containing unit ``t`` (may be empty for hopping gaps)."""
    last = t // slide
    first = max(0, (t - win) // slide + 1)
    return range(first, last + 1)


def windowed_agg(
    df: pd.DataFrame,
    keys: list[str],
    unit: str,
    win: int,
    slide: int,
    agg: Callable[[pd.DataFrame], dict],
    origin: int = 0,
) -> pd.DataFrame:
    """Windowed aggregation oracle: ``agg(window_rows) -> {col: value}``
    applied to every non-empty (key, gwid) group; rows sorted by unit
    within the window (the StreamArchive order,
    includes/stream_archive.hpp:59-68)."""
    rows = []
    for kv, g in df.groupby(keys, sort=False):
        kv = kv if isinstance(kv, tuple) else (kv,)
        buckets: dict[int, list[int]] = {}
        for idx, t in zip(g.index, g[unit]):
            for w in wid_range(int(t) - origin, win, slide):
                buckets.setdefault(w, []).append(idx)
        for w, idxs in buckets.items():
            content = df.loc[idxs].sort_values(unit, kind="stable")
            rec = dict(zip(keys, kv))
            rec["gwid"] = w
            rec["win_end"] = w * slide + win - 1 + origin
            rec.update(agg(content))
            rows.append(rec)
    out = pd.DataFrame(rows)
    return out.sort_values(keys + ["gwid"]).reset_index(drop=True)


def rolling_reduce(
    df: pd.DataFrame,
    keys: list[str],
    order: list[str],
    value: str,
    fn: str = "sum",
) -> pd.DataFrame:
    """Accumulator oracle: running per-key reduce, one output per input
    (includes/accumulator.hpp:157-192, emit at :181)."""
    out = df.sort_values(keys + order, kind="stable").copy()
    out["running"] = out.groupby(keys, sort=False)[value].transform(
        lambda s: getattr(s.expanding(), fn)()
    )
    return out.reset_index(drop=True)


def session_split(
    df: pd.DataFrame, keys: list[str], unit: str, gap: int
) -> pd.DataFrame:
    """Session-window oracle: cumulative gap-split per key (FIXTURES.md F7)."""
    out = df.sort_values(keys + [unit], kind="stable").copy()
    def _sessionize(s: pd.Series) -> pd.Series:
        return (s.diff() > gap).cumsum()
    out["session_id"] = out.groupby(keys, sort=False)[unit].transform(_sessionize)
    return out.reset_index(drop=True)


def asof_match(
    left: pd.DataFrame,
    right: pd.DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    bound: int,
) -> pd.DataFrame:
    """As-of join oracle via merge_asof per key (FIXTURES.md F7):
    latest right row with right_ts <= left_ts and within ``bound``."""
    l = left.sort_values(left_ts, kind="stable")
    r = right.sort_values(right_ts, kind="stable")
    merged = pd.merge_asof(
        l,
        r.rename(columns={right_ts: "_rts"}),
        left_on=left_ts,
        right_on="_rts",
        by=keys,
        direction="backward",
        tolerance=bound,
    )
    return merged.reset_index(drop=True)


def pareto_interarrival(rng: np.random.Generator, n: int, alpha: float = 1.05, kappa: float | None = None) -> np.ndarray:
    """Pareto-ish inter-arrival gaps mirroring the reference TB generator
    (src/sum_test_cpu/sum_tb.hpp:35-41, 114-141): ceil of a Pareto draw,
    clipped to >= 1. Exact C-RNG reproduction is NOT required — oracles
    recompute windows from the generated ts values (FIXTURES.md F3)."""
    if kappa is None:
        kappa = (1000 * 0.05) / 1.05
    draws = kappa / np.power(rng.random(n), 1.0 / alpha)
    return np.maximum(1, np.ceil(draws)).astype(np.int64)
