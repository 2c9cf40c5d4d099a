"""Dump `.explain(formatted)`-style physical plans of the headline
queries to PLANS.md — the plan-quality evidence artifact.

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as em  # noqa: E402
from windflow_spark.plans import audit  # noqa: E402
from windflow_spark.session import get_spark  # noqa: E402

SHOW = [
    "win_tb_sliding",
    "pane_farm_sliding",
    "win_mapreduce_sliding",
    "ysb_pipeline",
    "asof_join",
    "dedup_minhash_lsh",
    "embedding_topk",
    "micro1_stateless",
    "win_topk",
    "win_count_distinct",
    "ooo_drop",
    "win_topk_pane",
    "win_quantile",
    "cep_pattern",
    "cep_skip",
    "cep_kleene",
    "hash_split",
    "sample_k_per_key",
    "sample_k_weighted",
    "pack_sequences",
    "pack_bucketed_dense",
    "mix_sources",
    "text_repetition",
    "text_contamination",
    "bm25_scores",
    "dedup_components",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explain", master="local[4]", shuffle_partitions=4)
    qs = em.queries()
    out = [
        "# PLANS — physical plans of headline queries (auto-generated)",
        "",
        f"`python tools/explain_plans.py {sf_dir}` — static executed plans",
        "(exchanges inserted, AQE pending). Shuffle counts, broadcasts, and",
        "scan pushdown/pruning are asserted in tests/test_plans.py.",
        "",
    ]
    for name in SHOW:
        df = qs[name](spark, sf_dir)
        plan = audit.physical_plan(df)
        out += [
            f"## {name}",
            "",
            f"- shuffle exchanges: {audit.count_exchanges(df)}",
            f"- broadcast join: {audit.has_broadcast_join(df)}",
            f"- cartesian: {audit.has_cartesian(df)}",
            f"- scan columns: {sorted(set(audit.read_schema(df)))}",
            "",
            "```",
            plan.strip()[:4000],
            "```",
            "",
        ]
    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOW)} plans)")


if __name__ == "__main__":
    main()
