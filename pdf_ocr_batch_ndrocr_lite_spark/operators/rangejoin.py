"""Range (interval) join: points against [lo, hi) ranges.

Naive theta joins (`point >= lo AND point < hi`) degenerate to
broadcast-nested-loop; the scalable form bucketizes both sides on a fixed
grid so the join becomes an equi-join on bucket id plus a residual
predicate:

    ranges  → explode to every grid bucket they overlap
    points  → their single grid bucket
    join on bucket, refine with the exact range predicate

Shuffle volume = points + exploded ranges (range count × average span /
grid).  Grid size trades explode factor against bucket selectivity —
standard interval-join practice.  Everything below is built-ins only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(points: DataFrame, ranges: DataFrame,
                        point_col: str, lo_col: str, hi_col: str,
                        bucket_width: float) -> DataFrame:
    """Inner join: every (point, range) pair with lo <= point < hi."""
    bw = F.lit(float(bucket_width))
    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bw).cast("long"))
    r = ranges.withColumn(
        "_buckets",
        F.sequence(
            F.floor(F.col(lo_col) / bw).cast("long"),
            # explode up to floor(hi/bw) unconditionally: when hi is exactly
            # on a boundary this emits one bucket the (exclusive) range never
            # matches — a small cost, never a correctness issue.  (An
            # epsilon-subtraction here silently DROPS pairs whenever hi lies
            # within epsilon above a boundary: points in the topmost bucket
            # would never meet the range in the equi-join, and the residual
            # predicate cannot recover them.)
            F.floor(F.col(hi_col) / bw).cast("long"),
        ),
    ).withColumn("_bucket", F.explode("_buckets")).drop("_buckets")
    joined = p.join(r, "_bucket").filter(
        (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")
