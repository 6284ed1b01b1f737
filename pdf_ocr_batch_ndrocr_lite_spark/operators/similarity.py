"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; LSH/IVF bucketed
variants as the scale path.  All vector arithmetic is JVM-side
(`F.aggregate` / `F.zip_with` inside whole-stage codegen) — no Python in the
hot path.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_to_query(emb: DataFrame, query: Sequence[float],
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> DataFrame:
    """(id, cosine) of every row against a constant query vector.

    The query broadcasts as a literal array — a pure map stage, no shuffle,
    scan-bound at any scale."""
    q = F.array(*[F.lit(float(v)) for v in query])
    qn = sum(float(v) * float(v) for v in query) ** 0.5
    return emb.select(
        F.col(id_col),
        (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)))
        .alias("cosine"),
    )


def brute_force_topk(emb: DataFrame, query: Sequence[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Global top-k by cosine: map stage + TakeOrdered (no full sort —
    Spark's sort-limit physical operator keeps k rows per partition)."""
    scored = cosine_to_query(emb, query, id_col, vec_col)
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def topk_per_bucket(emb: DataFrame, query: Sequence[float], k: int = 3,
                    bucket_col: str = "label", id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Top-k within each coarse bucket (IVF cell / LSH bucket / shard):
    window rank over bucket — the distributed ANN building block."""
    scored = cosine_to_query(emb, query, id_col, vec_col) \
        .join(emb.select(id_col, bucket_col), id_col)
    w = Window.partitionBy(bucket_col).orderBy(
        F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(bucket_col, id_col, "cosine", "rank")
    )


def random_hyperplane_buckets(emb: DataFrame, planes: List[Sequence[float]],
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket id per row (random-hyperplane rounding, Charikar
    STOC 2002): bit b = (v · plane_b) > 0.

    `planes` are fixed constants (seeded off-line), so bucketing is a pure
    map stage; an ANN query probes only matching (or near-matching) buckets
    instead of the full corpus — the scan shrinks by ~2^len(planes)."""
    bucket = F.lit(0).cast("bigint")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(F.col(vec_col), p) > 0,
                     F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bucket = bucket + F.shiftleft(bit, b)
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def lsh_topk(emb: DataFrame, query: Sequence[float],
             planes: List[Sequence[float]], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: score only rows in the query's hyperplane bucket."""
    q_bucket = 0
    for b, plane in enumerate(planes):
        dot = sum(float(x) * float(y) for x, y in zip(query, plane))
        if dot > 0:
            q_bucket |= 1 << b
    buckets = random_hyperplane_buckets(emb, planes, id_col, vec_col)
    candidates = emb.join(
        buckets.filter(F.col("bucket") == q_bucket).select(id_col), id_col)
    return brute_force_topk(candidates, query, k, id_col, vec_col)
