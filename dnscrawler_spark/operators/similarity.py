"""Similarity search over embedding columns (ARRAY<FLOAT>).

Three paths, same answer shape (query_id, vec_id, score):

- ``cosine_topk``: brute-force exact — the baseline and the oracle for
  recall measurement. Dot products via ``zip_with``/``aggregate``
  (JVM-side higher-order functions, no UDF); at 100 TB this is the
  per-partition scan you run when the candidate set is already small.
- ``lsh_topk``: random-hyperplane LSH bucketing (sign-bit sketch via
  deterministic per-dimension hash weights) — the scale path: only
  vectors sharing a bucket are scored, so the crossjoin never
  materializes. Recall is tunable with n_planes/n_tables; a property
  test pins recall ≥ 0.8 on the benchmark corpus.
- ``ivf_topk``: inverted-file (IVF) coarse quantizer — the other
  standard ANN scale path. A tiny deterministic centroid set (the
  "trained" quantizer: O(n_centroids·dim) bytes, independent of
  corpus size) is embedded as literal expressions, so cluster
  assignment is one codegen'd projection with NO shuffle and NO
  Python; queries probe their ``n_probe`` nearest centroid lists and
  only those lists are exactly re-ranked.

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
    side streams. Excludes self-matches. Each side's norm is projected
    once before the join (not re-derived per scored pair) — same
    expression, bit-identical score."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    c = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("c_vec"), F.col("q_vec"))
                / (F.col("_cn") * F.col("_qn")),
                6,
            ).alias("score"),
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
        _norm(F.col(vec_col)).alias("_cn"),
        hyperplane_sketch(F.col(vec_col), n_planes).alias("bucket"),
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("_qn"),
        hyperplane_sketch(F.col(vec_col), n_planes).alias("qb"),
    )
    # probe buckets: exact + all single-bit flips (multi-probe LSH)
    probes = F.array(
        F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    )
    q = q0.select("query_id", "q_vec", "_qn", F.explode(probes).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("c_vec"), F.col("q_vec"))
                / (F.col("_cn") * F.col("_qn")),
                6,
            ).alias("score"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "score", "rn")
    )


# ---------------------------------------------------------------- IVF


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic coarse-quantizer "training": the ``n_centroids``
    corpus vectors with the smallest ``xxhash64(vec_id, 'ivf-train')``
    — a seedless-reproducible uniform sample (the same idea as the LSH
    hyperplane weights). Cluster id = position in the returned list.

    This is the ONLY driver-side materialization in the IVF path and
    it is O(n_centroids · dim) — independent of corpus size, exactly
    like shipping a trained faiss quantizer to the workers. At cluster
    scale the list rides task broadcast as literals; a k-means refine
    step would slot in here without touching the query path."""
    # hash the id at (widened) native type for integral ids — unchanged
    # behavior; for non-integral ids the old cast("long") yielded NULL,
    # xxhash64 skipped the column and every row hashed identically,
    # degenerating the "uniform sample" to the n smallest ids (ADVICE
    # r5 #2) — hash the native value instead.
    from pyspark.sql import types as T

    id_type = embeddings.schema[id_col].dataType
    if isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        id_hash = F.col(id_col).cast("long")
    else:
        id_hash = F.col(id_col)
    rows = (
        embeddings.select(
            F.col(id_col).alias("cid_src"),
            F.col(vec_col).cast("array<double>").alias("v"),
            F.xxhash64(id_hash, F.lit("ivf-train")).alias("h"),
        )
        .orderBy("h", "cid_src")
        .limit(n_centroids)
        .collect()
    )
    return [[float(x) for x in r.v] for r in rows]


def _lit_vec(cv: list[float]):
    """Literal ARRAY<DOUBLE> as ONE parsed SQL expression. The old
    ``F.array(*[F.lit(x) ...])`` built dim py4j Column objects per
    centroid — for 16 centroids × 64 dims × (corpus + query side) that
    was ~2 s of driver-side expression construction per query (measured,
    r6). ``repr(float)`` is the shortest round-trip form and Spark's
    double-literal parse is correctly rounded, so the values are
    bit-identical to the F.lit path (agreement-tested)."""
    return F.expr("array(" + ",".join(repr(float(x)) + "D" for x in cv) + ")")


def _py_norm(cv: list[float]) -> float:
    """L2 norm computed with exactly the fold order of ``_norm`` over a
    literal array (sequential left-fold sum of squares, then sqrt) —
    IEEE-754 binary64 ops are deterministic and identical in Python and
    the JVM, so embedding this as a literal replaces a per-ROW
    re-computation of each centroid's norm with a plan-time constant,
    bit-for-bit."""
    import math

    s = 0.0
    for x in cv:
        s += float(x) * float(x)
    return math.sqrt(s)


def _centroid_scores(vec_col, centroids: list[list[float]], norm_col=None):
    """Array of (cosine(vec, centroid_c), c) structs, one per centroid,
    as literal-backed codegen'd expressions (no join, no shuffle).
    ``norm_col`` lets the caller compute the vector's own norm ONCE and
    reuse it across all centroids (the expression is unchanged:
    dot / (norm_vec * norm_centroid), same operand order)."""
    if norm_col is None:
        norm_col = _norm(vec_col)
    return F.array(
        *[
            F.struct(
                (
                    _dot(vec_col, _lit_vec(cv))
                    / (norm_col * F.lit(_py_norm(cv)))
                ).alias("s"),
                F.lit(ci).alias("cid"),
            )
            for ci, cv in enumerate(centroids)
        ]
    )


def assign_cluster(vec_col, centroids: list[list[float]], norm_col=None):
    """argmax-cosine cluster id (ties → larger cid, the struct max)."""
    return F.array_max(_centroid_scores(vec_col, centroids, norm_col))["cid"]


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via inverted-file partitioning: every corpus
    vector lands in exactly one centroid list; each query exactly
    re-ranks only its ``n_probe`` nearest lists. The corpus-side pass
    is a stateless projection (assignment is literal arithmetic), so
    at 10^9 vectors the plan is scan → project → hash-join on a
    16-value key with the tiny exploded query side broadcast — no
    crossjoin ever materializes and recall is tuned by n_probe."""
    cents = train_centroids(embeddings, n_centroids, vec_col, id_col)
    # the vector's own norm is projected ONCE and reused by every
    # centroid cosine (it was re-derived n_centroids times per row) and
    # again by the exact re-rank after the join (8 bytes/row extra on
    # the shuffle for dim× fewer multiplications per scored pair)
    c = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("c_vec"),
        )
        .withColumn("_vn", _norm(F.col("c_vec")))
        .withColumn(
            "cluster", assign_cluster(F.col("c_vec"), cents, F.col("_vn"))
        )
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).withColumn("_qn", _norm(F.col("q_vec")))
    # n_probe nearest centroids by (score desc, cid desc): struct sort
    probes = F.slice(
        F.reverse(
            F.array_sort(
                _centroid_scores(F.col("q_vec"), cents, F.col("_qn"))
            )
        ),
        1,
        n_probe,
    )
    q = q0.select(
        "query_id",
        "q_vec",
        "_qn",
        F.explode(F.transform(probes, lambda e: e["cid"])).alias("cluster"),
    )
    # one cluster per corpus vector + distinct probe clusters per query
    # => candidate pairs are already unique; no dedup stage needed
    scored = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("c_vec"), F.col("q_vec"))
                / (F.col("_vn") * F.col("_qn")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "score", "rn")
    )
