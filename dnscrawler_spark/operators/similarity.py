"""Similarity search over embedding columns (ARRAY<FLOAT>).

Two paths, same answer shape (query_id, vec_id, score):

- ``cosine_topk``: brute-force exact — the baseline and the oracle for
  recall measurement. Dot products via ``zip_with``/``aggregate``
  (JVM-side higher-order functions, no UDF); at 100 TB this is the
  per-partition scan you run when the candidate set is already small.
- ``lsh_topk``: random-hyperplane LSH bucketing (sign-bit sketch via
  deterministic per-dimension hash weights) — the scale path: only
  vectors sharing a bucket are scored, so the crossjoin never
  materializes. Recall is tunable with n_planes/n_tables; a property
  test pins recall ≥ 0.8 on the benchmark corpus.

Scores are rounded to 6 dp so engine-vs-oracle hash comparison is not
at the mercy of float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    ``queries`` is expected to be small (it is broadcast); the corpus
    side streams. Excludes self-matches."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("c_vec"), F.col("q_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "score", "rn")
    )


def _plane_weight(plane: int, dim: int) -> F.Column:
    """Deterministic pseudo-gaussian weight for (plane, dim): xxhash64
    mapped to [-1, 1). Cheap, seedless-reproducible, JVM-side."""
    h = F.xxhash64(F.lit(plane), F.lit(dim), F.lit("hyperplane"))
    return (h.cast("double") / F.lit(float(2**63))).cast("double")


def hyperplane_sketch(vec_col, n_planes: int = 16) -> F.Column:
    """Sign-bit sketch: bit p = sign(Σ_d w(p,d)·vec[d]). Returns BIGINT."""
    def bit(p):
        s = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec_col) - 1),
                    lambda d: F.xxhash64(F.lit(p), d, F.lit("hyperplane")).cast("double")
                    / F.lit(float(2**63)),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for p in range(n_planes):
        out = out + bit(p)
    return out


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's
    hyperplane bucket (plus all buckets at hamming ≤ 1, to lift recall).

    The bucket join replaces the crossjoin — at 10^9 vectors this is
    the difference between feasible and not."""
    c = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_sketch(F.col(vec_col), n_planes).alias("bucket"),
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_sketch(F.col(vec_col), n_planes).alias("qb"),
    )
    # probe buckets: exact + all single-bit flips (multi-probe LSH)
    probes = F.array(
        F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    )
    q = q0.select("query_id", "q_vec", F.explode(probes).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col(F.col("c_vec"), F.col("q_vec")), 6).alias("score"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "score", "rn")
    )
