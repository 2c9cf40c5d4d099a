"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exact baseline. Queries (small) are
  broadcast against the corpus; the dot product is a native
  zip_with/aggregate expression (JVM codegen, no Python). At 100 TB the
  corpus side stays partitioned; cost is one broadcast + map-side top-k
  via window rank per query.
- LSH-bucketed ANN: random-hyperplane signatures (seeded, deterministic)
  shrink each probe to one bucket (+ optional multi-probe neighbors);
  the scale path — candidate generation is a hash join on bucket id.
- IVF-style variant: coarse k-means-ish centroids picked
  deterministically, probe nearest nprobe cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """float64 dot product with deterministic left-to-right summation
    (F.aggregate is sequential) so oracles can match it."""
    ad, bd = a.cast("array<double>"), b.cast("array<double>")
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def l2_norm(a: Column) -> Column:
    """float64 L2 norm, same summation contract as dot_product."""
    return F.sqrt(dot_product(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns. For joins,
    prefer precomputing ``l2_norm`` per ROW on each side and dividing
    the pair dot by the norm product — this expression recomputes both
    norms per PAIR (the brute-force path paid 3 aggregate folds per
    pair before r6 precomputed them; result is bit-identical since the
    op sequence dot/(sqrt(aa)*sqrt(bb)) is unchanged)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase exact top-k per q_id over scored (q_id, c_id, cos) rows.

    Phase 1 — per-partition partial top-k, NO shuffle: embedding columns
    are dropped first, then one Arrow mapInPandas pass keeps at most k
    candidates per q_id per input partition (pruning after every batch so
    memory stays ~|Q|×k rows). Phase 2 — the usual row_number window, now
    over ≤ partitions × |Q| × k narrow survivors instead of every scored
    (corpus × query) row. Equivalent to ranking the full set: pruning
    uses the same (cos desc, c_id asc) order, so any row it drops is
    dominated by k rows in its own partition. At 100 TB this turns the
    N×Q-row rank shuffle into a bounded one.

    Non-finite cosines (a zero-norm vector divides 0/0 → NaN) are
    EXCLUDED before ranking: pandas sort_values places NaN last while
    Spark's desc window ranks NaN greatest, so a NaN surviving into
    phase 1 would break the two-phase equivalence — and a NaN "top"
    neighbor is meaningless anyway. The exclusion happens INSIDE the
    pandas prune (dropna), not as a Catalyst filter: a filter on the
    cos column gets pushed into the producing join's CONDITION, where
    its null/NaN checks re-evaluate the whole cosine expression per
    pair on top of the projection's copy (observed 3× the fold work in
    the brute-force plan)."""
    slim = scored.select("q_id", "c_id", "cos")
    schema = slim.schema

    def _prune(batches):
        acc = None
        for pdf in batches:
            pdf = pdf[np.isfinite(pdf["cos"].to_numpy())]
            acc = pdf if acc is None else pd.concat((acc, pdf), ignore_index=True)
            acc = (
                acc.sort_values(
                    ["q_id", "cos", "c_id"], ascending=[True, False, True],
                    kind="mergesort",
                )
                .groupby("q_id", sort=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    pruned = slim.mapInPandas(_prune, schema)
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id").asc())
    return (
        pruned.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "c_id", "cos")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query (query ≠ self). Queries broadcast;
    rank by (rounded cosine desc, corpus id asc) — rounding makes the
    ranking reproducible across engines/summation orders."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_n"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("c_n"),
    )
    # norms are per-ROW projections (N + Q folds total, not N×Q); the
    # per-pair work is ONE dot fold. Same op sequence as
    # dot/(sqrt(aa)*sqrt(bb)) -> bit-identical cosines.
    scored = c.join(F.broadcast(q), F.col("c_id") != F.col("q_id")).withColumn(
        "cos",
        F.round(
            dot_product(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_n") * F.col("c_n")),
            round_to,
        ),
    )
    return ranked_topk(scored, k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_signature_udf(dim: int, n_planes: int = 16, seed: int = 7):
    """Vectorized random-hyperplane signature: sign-bit integer per vec.
    One Arrow batch = one numpy matmul."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    return _sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 12,
    seed: int = 7,
    round_to: int = 6,
    probe_radius: int = 1,
) -> DataFrame:
    """ANN top-k: exact cosine ranking restricted to the query's LSH
    bucket(s). Bucket join replaces the cross join — the 100 TB path.

    Multi-probe: each query also probes buckets within hamming distance
    ``probe_radius`` of its signature (radius 1 ⇒ 1 + n_planes probe
    buckets — the standard recall/cost dial; corpus is never
    replicated, only the tiny query side explodes). Recall < 1 by
    construction; tested against brute force."""
    sig = lsh_signature_udf(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        sig(F.col(vec_col)).alias("bucket"),
    )
    probes = [F.col("_sig")]
    if probe_radius >= 1:
        probes += [F.col("_sig").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
    q = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            sig(F.col(vec_col)).alias("_sig"),
        )
        .withColumn("bucket", F.explode(F.array(*probes)))
        .drop("_sig")
    )
    # no pair dedup needed: each corpus row carries exactly ONE bucket and
    # a query's probe buckets (sig, sig^bit_i) are pairwise distinct, so a
    # (q, c) pair can match at most once
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to))
    )
    return ranked_topk(scored, k)


def embedding_dedup_pairs(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 11,
    exact: bool = False,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold).

    ``exact=True``: full self-join (small inputs / oracle parity).
    Default: LSH-bucketed self-join — near-identical vectors almost
    surely share all sign bits, so the bucket join finds them without
    the O(n²) cross product. Pass ``dim`` for the LSH path (avoids a
    driver-side probe of the vector width during plan build)."""
    a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if exact:
        j = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            raise ValueError(
                "dim is required for the LSH path (no driver-side probe "
                "of the vector width during plan build)"
            )
        sig = lsh_signature_udf(dim, n_planes, seed)
        a = a.withColumn("bucket", sig(F.col("va")))
        b = b.withColumn("bucket", sig(F.col("vb")))
        j = a.join(b, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    # no pair dedup: each vector carries one bucket, so an (a, b) pair can
    # match at most once in either path
    return (
        j.withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), round_to))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ivf_cell_udf(centroids: np.ndarray, nprobe: int = 1):
    """Vectorized IVF cell assignment: nearest ``nprobe`` centroids by
    cosine (one numpy matmul per Arrow batch). Returns an array<int>
    of cell ids (corpus uses nprobe=1; queries probe several)."""
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf("array<int>")
    def _cells(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ c.T  # (batch, n_cells)
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return _cells


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 4,
) -> "np.ndarray":
    """Spherical Lloyd's k-means for IVF codebooks: starts from the
    same deterministic md5-ordered sample ``ivf_topk`` uses untrained,
    then refines — per iteration ONE vectorized cosine-assignment UDF
    pass plus ONE map-side-combined aggregate (dim avg columns + a
    count per cell, k×(dim+1) partials — the only shuffle), centroids
    collected to the driver (k×dim floats, bounded). Empty cells keep
    their previous centroid; the assignment UDF re-normalizes, so the
    raw member mean is the spherical update. Deterministic for a FIXED
    partitioning (md5 init is layout-free, but the per-cell F.avg over
    doubles commits to partition-level summation order, so the learned
    codebook can drift across partition counts/AQE layouts — ADVICE r7
    #4; the ann_ivf_kmeans gate asserts the recall CLAIM column, whose
    floor absorbs that drift, not codebook bytes)."""
    dim = corpus.select(F.size(vec_col)).first()[0]
    cent_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    centroids = np.array([list(r[vec_col]) for r in cent_rows], dtype=np.float64)
    for _ in range(iters):
        assign = ivf_cell_udf(centroids, nprobe=1)
        agg = (
            corpus.select(
                F.explode(assign(F.col(vec_col))).alias("cell"),
                F.col(vec_col).alias("_v"),
            )
            .groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.avg(F.col("_v")[i]).alias(f"c{i}") for i in range(dim)],
            )
            .collect()
        )
        new = centroids.copy()
        for r in agg:
            new[r["cell"]] = [r[f"c{i}"] for i in range(dim)]
        centroids = new
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    round_to: int = 6,
    train_iters: int = 0,
) -> DataFrame:
    """IVF-style ANN top-k: corpus partitioned into ``n_cells`` Voronoi
    cells around deterministically-sampled centroids (md5-ordered pick —
    a seeded pseudo-random sample spread over the id space, reproducible
    across runs, unlike lowest-id which biases the codebook to one
    corner of insertion order); each query probes its ``nprobe`` nearest
    cells and exact-ranks only those candidates.

    Scale shape: cell assignment is one vectorized UDF pass; the
    candidate join is a hash join on cell id touching ~nprobe/n_cells
    of the corpus per query — the IVF analogue of the LSH bucket join.
    The centroid fetch is a bounded TakeOrdered (n_cells rows), the only
    driver-side collect in the module.

    ``train_iters > 0`` refines the sampled codebook with that many
    spherical Lloyd's iterations (``kmeans_centroids``) before
    assignment. Measured at sf0.01: on the UNIFORM random fixture
    training only rebalances cells (nprobe=6 mean recall 0.66 → 0.70
    at 2 iters — uniform data has no structure to learn); on a
    CLUSTERED fixture (12 anchor-shifted clusters, where IVF's value
    actually lives) nprobe=1 recall goes min 0.00 / mean 0.64
    untrained → min 0.60 / mean 0.96 with 3 iterations — the learned
    codebook aligns cells with the real clusters, so 1/16th of the
    corpus scanned returns near-exact neighbors."""
    if train_iters > 0:
        centroids = kmeans_centroids(
            corpus, id_col, vec_col, n_cells=n_cells, iters=train_iters
        )
    else:
        cent_rows = (
            corpus.select(id_col, vec_col)
            .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
            .limit(n_cells)
            .collect()
        )
        centroids = np.array(
            [list(r[vec_col]) for r in cent_rows], dtype=np.float64
        )
    c_assign = ivf_cell_udf(centroids, nprobe=1)
    q_assign = ivf_cell_udf(centroids, nprobe=nprobe)
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        F.explode(c_assign(F.col(vec_col))).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(q_assign(F.col(vec_col))).alias("cell"),
    )
    # no pair dedup needed: corpus rows are assigned nprobe=1 ⇒ exactly
    # one cell each, and a query's probe cells are distinct, so a (q, c)
    # pair can match at most once — a distinct here would shuffle full
    # embedding arrays for nothing
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to))
    )
    return ranked_topk(scored, k)
