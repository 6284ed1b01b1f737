"""Structured Streaming variant of the extraction pipeline.

The reference is strictly batch (SURVEY.md §2.9); its in-process analogues —
the LogQueue progress pump (/root/reference/app.py:970-989, 3036-3060) and
cooperative stop-flag polling (app.py:1586-1609) — map onto Spark's native
streaming machinery.  This module is the continuous-ingest path a crawl
pipeline needs: new page files land in a directory / Iceberg table and are
extracted incrementally with exactly-once sink semantics.

Design notes for scale:
- The dispatcher is the SAME pure mapInPandas stage as batch — stateless per
  row, so it needs no watermark or state store.
- Idempotency comes from the streaming checkpoint (offsets + file sink log),
  replacing the batch checkpoint table's anti-join.
- `maxFilesPerTrigger` bounds micro-batch size the way the Arrow page
  budget bounds batch memory.
- Lineage counters use foreachBatch: each micro-batch appends its
  per-partition-key rollup to the lineage table inside the same transaction
  scope Spark gives foreachBatch (batchId-keyed, replayable).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import extract as ex
from ..plans import checkpoint as ck

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")


def read_pages_stream(spark: SparkSession, input_path: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a growing directory of parquet page files."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def extract_stream(pages: DataFrame) -> DataFrame:
    """Streaming extraction: single-pass name-rule routing + the batch
    dispatcher (same plan shape as batch `run_extraction`, minus the salted
    shuffle — micro-batches are already size-bounded by the trigger)."""
    flagged = pages.select(
        "url", "lang",
        F.col("url").rlike(ex.GENERATED_NAME_PATTERN).alias("skip_name"),
        F.length(F.col("html")).cast("bigint").alias("bytes_len"),
        F.when(F.col("url").rlike(ex.GENERATED_NAME_PATTERN),
               F.lit(b"")).otherwise(F.col("html")).alias("html"),
    )
    return flagged.mapInPandas(ex.extract_batches, schema=ex.EXTRACT_SCHEMA)


def start_extraction_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    stream_checkpoint: str,
    lineage_path: Optional[str] = None,
    trigger_once: bool = False,
    max_files_per_trigger: int = 8,
):
    """Wire source → dispatcher → sinks and start the query.

    With ``trigger_once`` (availableNow) this is an incremental batch run:
    process everything new, then stop — the idiomatic 'resume' for file
    ingest.  Returns the StreamingQuery.
    """
    results = extract_stream(
        read_pages_stream(spark, input_path, max_files_per_trigger))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.persist()
        try:
            (out.filter(F.col("action") == ex.ACTION_EXTRACTED)
             .select("url", "lang", "doc_kind", "extracted_text",
                     "page_count", "token_count", "block_count")
             .write.mode("append").parquet(output_path))
            if lineage_path:
                (ck.lineage_from_results(out)
                 .withColumn("batch_id", F.lit(batch_id))
                 .write.mode("append").parquet(lineage_path))
        finally:
            out.unpersist()

    writer = (
        results.writeStream
        .foreachBatch(sink)
        .option("checkpointLocation", stream_checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
