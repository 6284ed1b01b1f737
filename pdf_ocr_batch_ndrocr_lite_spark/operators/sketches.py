"""Sketch operators with deterministic, engine-portable semantics.

Spark's approx_count_distinct (HLL++) is implementation-defined, so it
cannot be oracle-checked across engines.  The KMV (k-minimum-values)
estimator below (Bar-Yossef et al., "Counting distinct elements in a data
stream", RANDOM 2002; mergeability per Beyer et al., SIGMOD 2007) is
fully deterministic: element hashes are the first 15 hex
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
                 k: int = 64, salt_partitions: int = 32) -> DataFrame:
    """Per-group distinct-count sketch: exact below k, KMV estimate above.

    estimate = floor((k-1) / (kth_min / 16^15)) — double arithmetic in a
    fixed op order, then floor to int64: bitwise-reproducible across
    engines.

    Two-phase min-k so no single aggregation state holds all distinct
    hashes of a group (round 1 used a single collect_set — O(distinct)
    executor memory, an OOM at 10^9 distinct values per group):

      phase 1: groupBy(group, pmod(hash, P)) → k smallest per salt cell
               (cell state is O(distinct/P); size P for the target scale,
               e.g. P=4096 bounds a 10^9-distinct group at ~2 MB/cell)
      phase 2: groupBy(group) over the P arrays → flatten, re-take k
               smallest (merge state is O(k*P), a few hundred KB)

    Identical result to the one-phase form: a given hash value always lands
    in the same salt cell (pmod is deterministic), so the flattened union
    is exactly the distinct hash set's per-cell minima, and the global k
    smallest survive phase 1 by construction."""
    salt = F.pmod(F.col("_h"), F.lit(salt_partitions)).alias("_salt")
    hashed = df.select(*group_cols, _hash60(F.col(value_col)).alias("_h"))
    partial = hashed.groupBy(*group_cols, salt).agg(
        F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("_cell_mins"),
    )
    per_group = partial.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("_cell_mins"))), 1, k)
        .alias("_mins"),
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
