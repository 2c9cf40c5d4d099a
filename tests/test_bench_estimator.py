"""Scaling-headline estimator guardrails (VERDICT r3 #1): the
condition-matched pair estimator must reject steal/bandwidth-mismatched
adjacent pairs (the r3 failure: a 39k-steal 8-core sample paired with a
24k-steal 32-core one read an impossible 1.222) and never report an
efficiency above 1.0. Pure-python test — no Spark session."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import headline_from_pairs  # noqa: E402


def _s(cores, sec, steal, bw):
    return {"cores": cores, "sec": sec, "steal_jiffies": steal,
            "bw_pre_gbps": bw}


R3_BAD_PAIR = [  # the actual r3 samples behind the 1.222 artifact
    _s(32, 14.044, 24357, 40.0),
    _s(8, 68.654, 39356, 41.0),
]


def test_r3_pathological_pair_is_invalid():
    r = headline_from_pairs(R3_BAD_PAIR)
    assert r["pairs"][0]["valid"] is False
    assert abs(r["pairs"][0]["eff"] - 1.222) < 0.01  # raw read preserved
    assert r["headline_valid"] is False
    assert r["efficiency_8_to_32"] <= 1.0  # clamped even in fallback


def test_clean_pair_wins_over_mismatched():
    samples = R3_BAD_PAIR + [
        _s(32, 7.2, 100, 45.0),
        _s(8, 20.5, 50, 46.0),
    ]
    r = headline_from_pairs(samples)
    assert r["headline_valid"] is True
    assert r["efficiency_8_to_32"] == 0.712  # the clean pair, not the 1.2+


def test_bw_mismatch_invalidates_even_with_low_steal():
    r = headline_from_pairs([
        _s(32, 7.0, 10, 55.0),
        _s(8, 40.0, 10, 14.0),  # 8-core side ran bandwidth-starved
    ])
    assert r["pairs"][0]["valid"] is False
    assert r["headline_valid"] is False


def test_headline_clamps_at_one():
    r = headline_from_pairs([
        _s(32, 5.0, 10, 45.0),
        _s(8, 21.0, 10, 45.0),  # eff 1.05 — matched but noisy
    ])
    assert r["efficiency_8_to_32"] == 1.0
    assert r["pairs"][0]["eff"] > 1.0  # raw value still recorded


def test_non_adjacent_same_size_samples_make_no_pair():
    r = headline_from_pairs([_s(32, 7.0, 10, 45.0), _s(32, 7.1, 10, 45.0)])
    assert r == {}


def _s2(cores, sec, steal, bw_pre, bw_post):
    return {"cores": cores, "sec": sec, "steal_jiffies": steal,
            "bw_pre_gbps": bw_pre, "bw_probe_gbps": bw_post}


def test_mid_sample_bandwidth_collapse_invalidates():
    """r4 failure mode: clean steal + matched PRE probes, but the host
    bandwidth collapsed DURING the 32-core sample (post probe 23.1 vs
    pre 50.8) — the pair must not validate."""
    r = headline_from_pairs([
        _s2(8, 23.274, 55, 51.4, 17.8),
        _s2(32, 10.773, 569, 50.8, 23.1),
    ])
    assert r["pairs"][0]["valid"] is False
    assert r["headline_valid"] is False


def test_held_bandwidth_validates():
    r = headline_from_pairs([
        _s2(8, 19.591, 192, 46.6, 53.8),
        _s2(32, 7.972, 269, 46.4, 34.4),  # post 0.74x pre — held
    ])
    assert r["pairs"][0]["valid"] is True
    assert r["efficiency_8_to_32"] == 0.614
