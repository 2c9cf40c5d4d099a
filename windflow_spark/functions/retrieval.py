"""Lexical retrieval scoring for corpus pipelines: TF-IDF vectors and
BM25 query scoring — the ranking signals a training-data run uses for
quality-weighted sampling and query-targeted corpus slicing (and the
classic search baseline a reference user expects next to dedup/ANN).

Scale posture (100 TB):
- the corpus side is ONE (doc, term) term-frequency aggregate off the
  tokenized explode (map-side combined), plus a per-term df aggregate
  whose output is vocabulary-sized, not corpus-sized;
- the query side is tiny (query suites are KBs) — its distinct terms
  are BROADCAST, so the only row-count-scale shuffle carries corpus
  (doc, term) rows that MATCH a query term, proportional to hits;
- document length / avgdl are one column-pruned aggregate; avgdl is a
  broadcast scalar.

Everything is pure Catalyst (no Python UDFs); scores are plain
float64 formulas over exact integer counts, so a DuckDB oracle
recomputes them to the shared round(·, 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from windflow_spark.functions.text import normalize_text, tokens


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf) over normalized whitespace tokens — the shared
    corpus-side building block (one explode + one map-side-combined
    aggregate). Empty/blank docs contribute no rows."""
    return (
        df.select(
            F.col(id_col),
            F.explode(tokens(normalize_text(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def tfidf_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Sparse TF-IDF rows: (id, term, tf, df, tfidf) with the standard
    smoothed idf = ln((N + 1) / (df + 1)) + 1 (sklearn's convention —
    published, never zero, no division hazards). ``min_df`` prunes the
    long vocabulary tail BEFORE the join (the classic vocabulary-size
    control). tfidf is rounded to 4 dp (the engine-wide float-gate
    contract)."""
    tf = term_frequencies(df, id_col, text_col)
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0))
                    + F.lit(1.0)
                ),
                4,
            ).alias("tfidf"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 (Robertson/Sparck Jones, the Okapi formula) of every
    document against every query it shares a term with: (query_id, id,
    score). Queries are the SMALL side — their distinct (query, term)
    pairs broadcast into the corpus tf table, so cost is proportional
    to matching (doc, term) rows, never |docs| × |queries|.

    idf = ln(1 + (N − df + 0.5) / (df + 0.5))  (the non-negative
    variant); score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b +
    b·dl/avgdl)). dl = token count, avgdl over all docs. Docs sharing
    no term score no row (a LEFT join against this output reads absent
    as 0). Scores round to 4 dp."""
    tf = term_frequencies(docs, id_col, text_col)
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.array_distinct(tokens(normalize_text(query_text_col)))
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    dl = docs.select(
        F.col(id_col),
        F.size(tokens(normalize_text(text_col))).cast("double").alias("_dl"),
    )
    stats = docs.select(
        F.count(F.lit(1)).cast("double").alias("_n")
    ).crossJoin(
        F.broadcast(
            dl.select(F.avg("_dl").alias("_avgdl"))
        )
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("_df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
        ).alias("_idf"),
    )
    hits = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .join(dl.withColumnRenamed(id_col, "_did"),
              F.col(id_col) == F.col("_did"))
        .crossJoin(F.broadcast(stats.select("_avgdl")))
    )
    contrib = F.col("_idf") * (
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
    )
    return (
        hits.groupBy("query_id", id_col)
        .agg(F.round(F.sum(contrib), 4).alias("score"))
    )
