"""Edge semantics of the custom join operators."""

from __future__ import annotations

import datetime as dt

from pdf_ocr_batch_ndrocr_lite_spark.operators.asof import asof_join
from pdf_ocr_batch_ndrocr_lite_spark.operators.rangejoin import (
    range_join_bucketed,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_edges(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5)), (1, 11, _ts(1)), (2, 20, _ts(9)),
         (3, 30, _ts(4))],
        "k int, lid int, ts timestamp")
    right = spark.createDataFrame(
        [(1, 100, _ts(2)), (1, 101, _ts(5)), (2, 200, _ts(10))],
        "k int, rid int, ts timestamp")
    out = {r["lid"]: r["asof_rid"]
           for r in asof_join(left, right, ["k"], "ts", "ts",
                              ["rid"]).collect()}
    assert out[10] == 101   # same-timestamp right row IS visible (<=)
    assert out[11] is None  # no right row at or before ts(1)
    assert out[20] is None  # right row is strictly later
    assert out[30] is None  # key with no right rows at all
    assert len(out) == 4    # every left row survives (left join)


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 4999.99), (3, 5000.0), (4, 9999.0), (5, -1.0)],
        "pid int, v double")
    ranges = spark.createDataFrame(
        [(0, 0.0, 5000.0), (1, 5000.0, 10000.0)],
        "band int, lo double, hi double")
    out = {r["pid"]: r["band"]
           for r in range_join_bucketed(points, ranges, "v", "lo", "hi",
                                        bucket_width=1000.0).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1}  # lo inclusive, hi exclusive;
    # pid 5 (below every range) drops out entirely


def test_range_join_matches_theta(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    bands = spark.createDataFrame(
        [(0, 0.0, 7000.0), (1, 3000.0, 50000.0), (2, 50000.0, 120000.0)],
        "band int, lo double, hi double")  # overlapping bands: multi-match
    fast = range_join_bucketed(li, bands, "l_extendedprice", "lo", "hi",
                               5000.0)
    slow = li.join(bands, (li.l_extendedprice >= bands.lo)
                   & (li.l_extendedprice < bands.hi))
    key = lambda r: (r["l_orderkey"], r["l_linenumber"], r["band"])
    assert sorted(map(key, fast.collect())) == \
        sorted(map(key, slow.collect()))