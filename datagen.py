"""Deterministic synthetic data generators (FIXTURES.md F1-F3, F6).

All generators are seeded and pure (numpy default_rng); no external
data. The transcripts table matches BASELINE.json input_hint exactly:
``(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)``. Zipf-skewed conversation lengths produce
the hot-key fixture for pane/salting tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

def write_parquet_us(pdf: pd.DataFrame, path: str) -> None:
    """Write a pandas frame as Spark-readable parquet: timestamps
    coerced to microseconds (Spark rejects TIMESTAMP(NANOS))."""
    pdf.to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )


ROLES = ["user", "assistant", "tool"]
ROLE_CYCLE = ["user", "assistant", "tool", "assistant"]  # FIXTURES.md F1
TOOLS = ["search", "python", "browser", "none"]
_WORDS = (
    "stream window pane tuple shuffle spark agent turn reply tool call "
    "result state key slide batch plan join merge emit flush check run"
).split()


def gen_transcripts(n_convs: int = 50, seed: int = 42, mean_turns: int = 40) -> pd.DataFrame:
    """Transcripts fixture (FIXTURES.md F1). conv k has
    ``n_k = max(4, round(zipf-skewed scaled))`` turns; per-conv ts =
    start + cumulative Pareto-ish inter-arrival (F3 rule)."""
    rng = np.random.default_rng(seed)
    # Zipf(1.2)-shaped sizes scaled to mean_turns, clipped
    raw = rng.zipf(1.2, n_convs).astype(np.float64)
    sizes = np.maximum(4, np.round(raw / raw.mean() * mean_turns)).astype(np.int64)
    sizes = np.minimum(sizes, mean_turns * 200)  # cap pathological draws
    frames = []
    base = pd.Timestamp("2026-01-01", tz="UTC").value // 1000  # epoch micros
    for k, n_k in enumerate(sizes):
        conv = f"conv-{k:06d}"
        idx = np.arange(n_k, dtype=np.int32)
        roles = np.array([ROLE_CYCLE[i % 4] for i in idx])
        tools = np.where(
            roles == "tool", np.array(TOOLS)[rng.integers(0, 3, n_k)], "none"
        )
        tails = [
            " ".join(np.array(_WORDS)[rng.integers(0, len(_WORDS), 6)]) for _ in idx
        ]
        text = [
            f"{r} turn {i} of {conv}: {t}" for r, i, t in zip(roles, idx, tails)
        ]
        kappa = (1000 * 0.05) / 1.05
        gaps = np.maximum(
            1, np.ceil(kappa / np.power(rng.random(n_k), 1.0 / 1.05))
        ).astype(np.int64)
        start = base + int(rng.integers(0, 10_000_000))
        ts_us = start + np.cumsum(gaps) * 1_000_000 // 1000  # ~ms-scale gaps
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv,
                    "turn_idx": idx,
                    "role": roles,
                    "text": text,
                    "tool": tools,
                    "ts": pd.to_datetime(ts_us, unit="us", utc=True).tz_localize(None),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def gen_cb_grid(length: int = 1000, keys: int = 4) -> pd.DataFrame:
    """CB window-sum fixture (FIXTURES.md F2; mirror of
    src/sum_test_cpu/sum_cb.hpp:106-117): for i in 0..len-1, for k in
    0..keys-1: (key=k, id=i, ts=0, value=i)."""
    i = np.repeat(np.arange(length, dtype=np.int64), keys)
    k = np.tile(np.arange(keys, dtype=np.int64), length)
    return pd.DataFrame({"key": k, "id": i, "ts": 0, "value": i.astype(np.int64)})


def gen_tb_grid(length: int = 1000, keys: int = 4, seed: int = 0) -> pd.DataFrame:
    """TB window-sum fixture (FIXTURES.md F3; mirror of
    src/sum_test_cpu/sum_tb.hpp:104-141): same (k, i, value=i) grid,
    per-key ts advances by Pareto-ish integer gaps."""
    rng = np.random.default_rng(seed)
    kappa = (1000 * 0.05) / 1.05
    frames = []
    for k in range(keys):
        gaps = np.maximum(
            1, np.ceil(kappa / np.power(rng.random(length), 1.0 / 1.05))
        ).astype(np.int64)
        frames.append(
            pd.DataFrame(
                {
                    "key": np.int64(k),
                    "id": np.arange(length, dtype=np.int64),
                    "ts": np.cumsum(gaps),
                    "value": np.arange(length, dtype=np.int64),
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def gen_ysb(n_events: int = 30_000, n_campaigns: int = 100, ads_per_campaign: int = 10, seed: int = 7):
    """YSB fixture (FIXTURES.md F6; src/yahoo_test_cpu/ysb_nodes.hpp:104-125):
    counter v drives every field; 100 campaigns × 10 ads static dim."""
    rng = np.random.default_rng(seed)
    n_ads = n_campaigns * ads_per_campaign
    v = np.arange(n_events, dtype=np.int64)
    events = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                1_700_000_000_000_000 + np.cumsum(rng.integers(100, 2000, n_events)) * 1000,
                unit="us",
            ),
            "user_id": v % 1000,
            "page_id": v % 100,
            "ad_id": (v % 100_000) % n_ads,
            "ad_type": (v % 5).astype(np.int32),
            "event_type": (v % 3).astype(np.int32),
            "ip": (v % 255).astype(np.int32),
        }
    )
    campaigns = pd.DataFrame(
        {
            "ad_id": np.arange(n_ads, dtype=np.int64),
            "cmp_id": np.arange(n_ads, dtype=np.int64) // ads_per_campaign,
        }
    )
    return events, campaigns
