"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key.

Spark has no native ASOF JOIN; the composition below expresses it with
built-ins only (no UDF, no per-row Python):

    union(tagged left, tagged right)
      → window per key ordered by (ts, side)   [right rows sort first]
      → last(right_value, ignoreNulls) carry-forward
      → keep left rows

One shuffle (the window partitioning).  Equal timestamps resolve
right-before-left, matching ASOF's `left.ts >= right.ts` containment.
A broadcast-range variant is preferable when the right side is tiny; this
form scales to large-large (both sides shuffle once on the key).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: List[str],
              left_ts: str, right_ts: str,
              value_cols: List[str]) -> DataFrame:
    """Left as-of join: every left row + latest right `value_cols` with
    right_ts <= left_ts within the same key.  Missing match → nulls."""
    lt = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in value_cols],
        F.struct(*left.columns).alias("_left"),
    )
    rt = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(lt.schema["_left"].dataType).alias("_left"),
    )
    unioned = lt.unionByName(rt)
    # final tiebreak on the carried value columns: when several right rows
    # share the same (key, ts), last() must pick the same one on every run
    # (and in every engine) — without it the carried value is whatever
    # partition-internal order the shuffle produced.  Ascending order means
    # the greatest value tuple wins.
    w = (Window.partitionBy(*key_cols)
         .orderBy("_ts", "_side", *[F.col(f"_r_{c}") for c in value_cols])
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.select(
        "_side", "_left",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
          for c in value_cols],
    )
    out = carried.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"asof_{c}") for c in value_cols],
    )
