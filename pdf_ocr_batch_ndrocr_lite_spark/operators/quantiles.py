"""Exact distributed quantiles (percentile_disc semantics).

Approximate quantile sketches (GK, t-digest, Spark's approxQuantile) are
implementation-defined and can't be oracle-checked across engines.  This
operator computes EXACT discrete quantiles with one shuffle:

    rank rows per group by (value, tiebreak)      [window, one exchange]
    per-group row count                            [same window, no extra
                                                    shuffle: count() over
                                                    the unordered frame]
    quantile q → the row with rn == max(1, ceil(q*n))   (percentile_disc)

Deterministic under ties (explicit tiebreak column), identical in any
engine, and scale-sane: the only data movement is the one hash exchange on
the group key; the per-group sort is Spark's external sort.  For the
100 TB case where a single group outweighs an executor, pre-aggregate to
(value, count) pairs first — the rank arithmetic is unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(df: DataFrame, group_col: str, value_col: str,
                    qs: Sequence[float], tiebreak_col: str) -> DataFrame:
    """(group, q, value) for each q in `qs` — discrete quantiles: the value
    whose rank is max(1, ceil(q * n)) within the group's (value, tiebreak)
    order."""
    w = Window.partitionBy(group_col).orderBy(value_col, tiebreak_col)
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        F.col(group_col), F.col(value_col),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    exploded = ranked.select(
        group_col, value_col, "_rn", "_n",
        F.explode(q_arr).alias("q"),
    )
    hit = exploded.filter(
        F.col("_rn") == F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.col("q") * F.col("_n"))))
    return hit.select(group_col, "q", F.col(value_col).alias("value"))
