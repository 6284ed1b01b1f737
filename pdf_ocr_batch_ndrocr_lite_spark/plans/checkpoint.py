"""Checkpoint / lineage table: idempotent, resumable runs.

Replaces the reference's per-run CSV metrics log and filename-based
reprocessing guards (/root/reference/app.py:1086-1142, 2471-2529) with a
keyed lineage table:

    (partition_key, docs, pages, bytes, parse_failures,
     skip_name, skip_has_text, needs_ocr, extracted, seconds, status,
     updated_at)

``partition_key`` is a stable hash bucket of ``url`` — NOT a physical Spark
partition id — so the same document always lands in the same key regardless
of cluster size, and a restart can anti-join finished keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.storage import StorageAdapter

DEFAULT_NUM_BUCKETS = 256

CHECKPOINT_COLS = [
    "partition_key", "docs", "pages", "bytes", "parse_failures",
    "skip_name", "skip_has_text", "needs_ocr", "extracted", "seconds",
    "status", "updated_at",
]


def with_partition_key(df: DataFrame, num_buckets: int = DEFAULT_NUM_BUCKETS
                       ) -> DataFrame:
    """Deterministic url-hash bucket; xxhash64 is JVM-side, no UDF."""
    return df.withColumn(
        "partition_key",
        F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets)).cast("int"),
    )


def pending_only(pages_df: DataFrame, spark: SparkSession,
                 checkpoint_path: str, storage: StorageAdapter,
                 num_buckets: int = DEFAULT_NUM_BUCKETS) -> DataFrame:
    """Left-anti join against finished partition keys (resume semantics).

    The finished-key set is tiny (≤ num_buckets rows) → Catalyst broadcasts
    the anti-join build side automatically; no shuffle of the big table.
    """
    keyed = with_partition_key(pages_df, num_buckets)
    ckpt = storage.read(spark, checkpoint_path)
    if ckpt is None:
        return keyed
    done = ckpt.filter(F.col("status") == "done").select("partition_key")
    return keyed.join(F.broadcast(done), "partition_key", "left_anti")


def lineage_from_results(results: DataFrame,
                         num_buckets: int = DEFAULT_NUM_BUCKETS) -> DataFrame:
    """Per-partition-key conditional-aggregation rollup of run metrics
    (counter semantics: app.py:183-189, 2675-2678, 2862-2885).
    Partial (map-side) aggregation applies — one shuffle of tiny rows."""
    keyed = with_partition_key(results, num_buckets)
    return keyed.groupBy("partition_key").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("page_count").cast("long").alias("pages"),
        F.sum("bytes_in").cast("long").alias("bytes"),
        F.sum(F.when(F.col("action") == "parse_failure", 1).otherwise(0))
        .cast("long").alias("parse_failures"),
        F.sum(F.when(F.col("action") == "skip_name", 1).otherwise(0))
        .cast("long").alias("skip_name"),
        F.sum(F.when(F.col("action") == "skip_has_text", 1).otherwise(0))
        .cast("long").alias("skip_has_text"),
        F.sum(F.when(F.col("action") == "needs_ocr", 1).otherwise(0))
        .cast("long").alias("needs_ocr"),
        F.sum(F.when(F.col("action") == "extracted", 1).otherwise(0))
        .cast("long").alias("extracted"),
        F.sum("seconds").alias("seconds"),
        F.lit("done").alias("status"),
        F.current_timestamp().alias("updated_at"),
    )


def commit_lineage(spark: SparkSession, checkpoint_path: str,
                   lineage: DataFrame, storage: StorageAdapter) -> None:
    """MERGE-style upsert keyed on partition_key (Iceberg MERGE INTO on a
    cluster; read-dedup-overwrite locally)."""
    storage.merge_upsert(spark, checkpoint_path, lineage,
                         key_cols=["partition_key"], order_col="updated_at")
