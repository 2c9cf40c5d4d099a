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


def _s2(cores, sec, steal, bw_pre, bw_post):
    return {"cores": cores, "sec": sec, "steal_jiffies": steal,
            "bw_pre_gbps": bw_pre, "bw_probe_gbps": bw_post}


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


def test_clean_pairs_win_over_mismatched():
    samples = R3_BAD_PAIR + [
        _s(32, 7.2, 100, 45.0),
        _s(8, 20.5, 50, 46.0),
        _s(32, 7.4, 80, 44.0),  # second clean window → 2 valid pairs
    ]
    r = headline_from_pairs(samples)
    assert r["headline_valid"] is True
    assert r["n_valid_pairs"] == 2
    assert r["efficiency_8_to_32"] == 0.712  # best clean pair, not the 1.2+


def test_single_valid_pair_ships_median_invalid():
    """r4 'what's wrong' #1: exactly one pair surviving the filters is
    the artifact shape itself — the headline must fall back to the
    median over all pairs with headline_valid=false, never a
    single-pair max."""
    samples = R3_BAD_PAIR + [
        _s(32, 7.2, 100, 45.0),
        _s(8, 20.5, 50, 46.0),  # the ONLY valid pair (eff 0.712)
    ]
    r = headline_from_pairs(samples)
    assert r["n_valid_pairs"] == 1
    assert r["headline_valid"] is False


R4_DRIVER_SAMPLES = [  # the literal r4 driver capture behind the 0.271
    _s2(32, 9.631, 229, 50.4, 56.6),
    _s2(8, 20.970, 58, 55.9, 36.5),
    _s2(32, 9.809, 82, 54.9, 56.1),
    _s2(8, 26.705, 315, 54.1, 26.1),
    _s2(32, 22.671, 429, 56.6, 50.4),
    _s2(8, 24.590, 32, 54.1, 54.8),
]


def test_r4_incoherent_32core_outlier_cannot_headline():
    """The r4 record bug: the one 'valid' pair used a 32-core sample
    that ran 22.671 s where same-condition neighbors ran 9.631/9.809 —
    invisible to steal + both bandwidth probes. The coherence check
    (side time ≤ 1.5× fastest clean same-core sample) kills that pair,
    and the ≤1-valid rule ships the median (0.534 — inside the run's
    honest 0.53-0.68 band) flagged invalid instead of 0.271 'valid'."""
    r = headline_from_pairs(R4_DRIVER_SAMPLES)
    bad = [p for p in r["pairs"] if abs(p["eff"] - 0.271) < 1e-9][0]
    assert bad["coherent"] is False and bad["valid"] is False
    assert r["n_valid_pairs"] == 0
    assert r["headline_valid"] is False
    assert abs(r["efficiency_8_to_32"] - 0.534) < 1e-9


def test_memrand_probe_mismatch_invalidates():
    """Condition (d): a pair whose random-access probes disagree (or
    collapse mid-sample) is invalid even with clean steal, matched
    bandwidth, and coherent times."""
    base = dict(cores=32, sec=8.0, steal_jiffies=10, bw_pre_gbps=45.0,
                bw_probe_gbps=46.0, mr_pre_mhps=500.0, mr_post_mhps=490.0)
    s8 = dict(base, cores=8, sec=22.0, mr_pre_mhps=510.0, mr_post_mhps=505.0)
    ok = headline_from_pairs([dict(base), dict(s8), dict(base)])
    assert ok["n_valid_pairs"] == 2 and ok["headline_valid"] is True
    # 32-core side's mr collapsed mid-sample → both its pairs die
    collapsed = dict(base, mr_post_mhps=200.0)
    r = headline_from_pairs([collapsed, dict(s8), collapsed])
    assert r["n_valid_pairs"] == 0 and r["headline_valid"] is False
    # pre-probe mismatch between the sides → invalid too
    skewed = dict(base, mr_pre_mhps=300.0, mr_post_mhps=295.0)
    r2 = headline_from_pairs([skewed, dict(s8), skewed])
    assert r2["n_valid_pairs"] == 0 and r2["headline_valid"] is False


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
