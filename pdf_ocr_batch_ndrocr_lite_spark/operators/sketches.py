"""Sketch operators with deterministic, engine-portable semantics.

Spark's approx_count_distinct (HLL++) is implementation-defined, so it
cannot be oracle-checked across engines.  The KMV (k-minimum-values)
estimator below is fully deterministic: element hashes are the first 15 hex
chars of md5 parsed as int64 (uniform in [0, 16^15)), the sketch is the k
smallest hashes, and the estimate is a pure function of the k-th smallest —
identical in any engine, mergeable (sketch of a union = re-take k smallest
of the union of sketches), and SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(16 ** 15)  # 2^60 — fits comfortably in int64


def _hash60(col):
    """Deterministic uniform int64 hash from md5's first 15 hex chars.
    The value casts through string so numeric inputs hash identically to
    the SQL oracle's md5(CAST(x AS VARCHAR))."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("bigint")


def kmv_distinct(df: DataFrame, group_cols, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group distinct-count sketch: exact below k, KMV estimate above.

    estimate = floor((k-1) / (kth_min / 16^15)) — double arithmetic in a
    fixed op order, then floor to int64: bitwise-reproducible across
    engines.  One shuffle; the min-k accumulator is mergeable (expressed as
    sort_array(collect_set)[1:k] here; at 100 TB an Aggregator keeps only k
    values per partition so memory stays O(k) per group)."""
    hashed = df.select(*group_cols, _hash60(F.col(value_col)).alias("_h"))
    per_group = hashed.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("_mins"),
    )
    n = F.size("_mins")
    kth = F.element_at("_mins", k).cast("double")
    estimate = F.when(n < k, n.cast("bigint")).otherwise(
        F.floor(F.lit(float(k - 1)) / (kth / F.lit(_HASH_SPACE)))
        .cast("bigint"))
    return per_group.select(
        *group_cols,
        estimate.alias("kmv_estimate"),
        n.alias("sketch_size"),
    )
