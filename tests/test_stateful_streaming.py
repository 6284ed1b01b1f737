"""Stateful streaming url dedup: state survives micro-batches AND restarts."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.sources.corpus import make_row
from pdf_ocr_batch_ndrocr_lite_spark.streaming.extract_stream import (
    PAGES_SCHEMA,
)
from pdf_ocr_batch_ndrocr_lite_spark.streaming.stateful import (
    dedup_urls_stateful,
)


def _land(spark, path, idxs):
    pdf = pd.DataFrame([make_row(42, i) for i in idxs])
    spark.createDataFrame(pdf).write.mode("append").parquet(path)


def _run_once(spark, inp, out, ckpt):
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 4).parquet(inp))
    deduped = dedup_urls_stateful(stream, num_buckets=8)
    q = (deduped.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)


def test_stateful_dedup_across_restarts(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _land(spark, inp, range(0, 40))
    _run_once(spark, inp, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 40

    # second wave OVERLAPS the first (20-59): the 20 repeats must be dropped
    # even though they arrive in new files, in a NEW run (state restored
    # from the streaming checkpoint)
    _land(spark, inp, range(20, 60))
    _run_once(spark, inp, out, ckpt)
    final = spark.read.parquet(out)
    assert final.count() == 60
    assert final.select("url").distinct().count() == 60

    # third wave: pure repeats → nothing new lands
    _land(spark, inp, range(0, 60))
    _run_once(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == 60


def test_state_bounded_by_eviction_horizon(spark, tmp_path):
    """Per-bucket state must stay O(cap): with a tiny cap, hashes evicted
    oldest-first mean an early url re-arriving AFTER eviction is treated as
    new (dedup horizon semantics) — which is only possible if the state
    array was actually truncated rather than growing without bound."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _run(cap):
        stream = (spark.readStream.schema(PAGES_SCHEMA)
                  .option("maxFilesPerTrigger", 100).parquet(inp))
        deduped = dedup_urls_stateful(stream, num_buckets=1,
                                      max_state_per_bucket=cap)
        q = (deduped.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(180)

    _land(spark, inp, range(0, 30))       # batch 1: urls 0-29 admitted
    _run(cap=10)                          # state keeps only the last 10
    assert spark.read.parquet(out).count() == 30

    _land(spark, inp, range(0, 5))        # urls 0-4 were evicted → re-admitted
    _run(cap=10)
    assert spark.read.parquet(out).count() == 35

    _land(spark, inp, range(0, 5))        # now 0-4 ARE in state → deduped
    _run(cap=10)
    assert spark.read.parquet(out).count() == 35


def test_rocksdb_state_store_restart(spark, tmp_path):
    """The docstring's promised RocksDB path: same dedup-across-restart
    semantics with the RocksDB state store provider (local-disk state +
    changelog checkpointing — the provider a real-crawl horizon needs)."""
    from pdf_ocr_batch_ndrocr_lite_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        use_rocksdb_state,
    )

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    use_rocksdb_state(spark)
    try:
        assert spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass") \
            == ROCKSDB_PROVIDER
        _land(spark, inp, range(0, 30))
        _run_once(spark, inp, out, ckpt)
        assert spark.read.parquet(out).count() == 30
        # restart with overlap: state restored from RocksDB checkpoint
        _land(spark, inp, range(10, 40))
        _run_once(spark, inp, out, ckpt)
        final = spark.read.parquet(out)
        assert final.count() == 40
        assert final.select("url").distinct().count() == 40
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)
