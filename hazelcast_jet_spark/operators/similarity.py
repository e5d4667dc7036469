"""Similarity search over embedding columns (SURVEY Phase 5).

Brute-force cosine top-k as the exact baseline and an LSH-bucketed
approximate variant as the 100 TB scale path.  Vector math uses Spark
higher-order functions (`zip_with` + `aggregate`) — JVM-side, no Python
in the loop.

Scale shape: brute-force against a FIXED query set broadcasts the queries
(map-only over the corpus, then a per-query top-k via window/limit); the
LSH variant buckets both sides by hyperplane signature so candidate pairs
shrink by ~2^planes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k: each query row against the corpus.

    The query side is broadcast (small by construction); ranking uses a
    per-query window with (similarity desc, id asc) — the id tiebreak
    makes results deterministic.  Self-matches are excluded.
    """
    c = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id", "corpus_id",
            F.round(cosine(F.col("qvec").cast("array<double>"),
                           F.col("cvec").cast("array<double>")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("corpus_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos_sim", "rank")
    )


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(vec · plane_i).
    Planes are fixed literals (deterministic, seedable by caller)."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def ann_lsh_topk(corpus: DataFrame, queries: DataFrame, planes: list[list[float]],
                 k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate NN: candidates share the hyperplane-signature bucket,
    then exact cosine re-rank inside the bucket.  The join shuffles on the
    signature (2^len(planes) buckets) instead of broadcasting the corpus —
    this is the plan that survives a 100 TB corpus."""
    sig = lambda df, idn, vn: df.select(
        F.col(id_col).alias(idn), F.col(vec_col).cast("array<double>").alias(vn),
        hyperplane_signature(F.col(vec_col).cast("array<double>"), planes).alias("sig"),
    )
    c = sig(corpus, "corpus_id", "cvec")
    q = sig(queries, "query_id", "qvec")
    scored = (
        c.join(q, "sig")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("corpus_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_dedup_pairs(df: DataFrame, planes: list[list[float]], threshold: float,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-by-embedding mode):
    LSH-bucket by hyperplane signature, pair within buckets (id_a < id_b),
    keep pairs with cosine ≥ threshold.  Same candidate-join shape as
    MinHash LSH — never O(n²) across buckets."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("sig", hyperplane_signature(F.col("v"), planes))
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "sig")
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "sig")
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(corpus: DataFrame, centroids: list[list[float]],
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (fixed literal centroid list → map-only, broadcast-free).  Query-time:
    probe the top-n closest centroid partitions only."""
    v = F.col(vec_col).cast("array<double>")
    dists = F.array(*[
        F.round(F.lit(1.0) - cosine(v, F.array(*[F.lit(float(x)) for x in c])), 9)
        for c in centroids
    ])
    return corpus.select(
        F.col(id_col), F.col(vec_col),
        F.array_position(dists, F.array_min(dists)).alias("centroid_id"),
    )
