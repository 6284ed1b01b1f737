"""Watermarked windowed aggregation over the pages stream."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.sources.corpus import make_row
from pdf_ocr_batch_ndrocr_lite_spark.streaming.extract_stream import (
    PAGES_SCHEMA,
)
from pdf_ocr_batch_ndrocr_lite_spark.streaming.windowed import (
    windowed_lineage,
)


def test_windowed_lineage_counts(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # warc_ts = EPOCH + i seconds → 1200 docs span 20 minutes = 2 windows
    pdf = pd.DataFrame([make_row(42, i) for i in range(1200)])
    spark.createDataFrame(pdf).write.parquet(inp)

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(inp)
    q = (windowed_lineage(stream, "10 minutes", "30 minutes")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    res = spark.read.parquet(out)
    rows = res.collect()
    # appended output only contains FINALIZED windows (watermark passed);
    # with a 30-min watermark over 20 min of data nothing finalizes in one
    # trigger — so land a late batch far in the future and re-trigger
    pdf2 = pd.DataFrame([make_row(42, i) for i in range(100000, 100010)])
    spark.createDataFrame(pdf2).write.mode("append").parquet(inp)
    q = (windowed_lineage(stream, "10 minutes", "30 minutes")
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)

    res = spark.read.parquet(out)
    agg = res.groupBy().agg(F.sum("docs").alias("d")).collect()[0]
    # the first 1200 docs' windows are now all older than the watermark
    assert int(agg["d"] or 0) >= 1200
    # window bounds align to 10-minute boundaries and counts split by lang
    w = res.filter(F.col("docs") > 0).limit(1).collect()[0]
    assert (w["window_end"] - w["window_start"]).total_seconds() == 600
    langs = {r["lang"] for r in res.select("lang").distinct().collect()}
    assert langs >= {"ja", "en", "de", "es", "zh"}
