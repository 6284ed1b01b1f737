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


# ---------------------------------------------------------------------------
# Run-config metadata.  The reference's CSV carries meta HEADER rows — run
# config, engine path, command template (app.py:1115-1142) — so a metrics
# file is self-describing.  Re-expressed as a `run_meta` append-only table
# next to the lineage table: one row per run attempt with the config and a
# code fingerprint, plus a CONTINUITY GUARD: `num_buckets` defines the
# partition_key space, so a resume with a different value would anti-join
# against keys from a different hash universe and silently reprocess or
# skip the wrong documents — that mismatch is an error, not a log line.
# ---------------------------------------------------------------------------

RUN_META_COLS = ["config_hash", "app_name", "num_buckets", "num_partitions",
                 "shuffle_partitions", "master", "code_version",
                 "created_at"]


def meta_path(checkpoint_path: str) -> str:
    return checkpoint_path.rstrip("/") + "_meta"


def _code_version() -> str:
    """Short fingerprint of the extraction-defining sources: any change
    to the dispatcher or the plan layer yields a new version string, so
    a lineage reader can tell which code produced which run."""
    import hashlib

    from ..operators import extract as _ex
    from . import pipeline as _pl

    h = hashlib.md5()
    for mod in (_ex, _pl):
        with open(mod.__file__, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:12]


def run_meta_row(spark: SparkSession, app_name: str, num_buckets: int,
                 num_partitions: int) -> DataFrame:
    """One-row run-config frame.  ``config_hash`` covers ONLY the
    correctness-critical continuity fields (currently num_buckets);
    everything else is recorded for reproducibility but free to vary
    between a run and its resume (a resume on a bigger cluster is
    normal; a resume in a different key universe is corruption)."""
    import hashlib

    conf = spark.sparkContext.getConf()
    config_hash = hashlib.md5(
        f"num_buckets={num_buckets}".encode()).hexdigest()[:12]
    row = [(config_hash, app_name, int(num_buckets), int(num_partitions),
            int(spark.conf.get("spark.sql.shuffle.partitions", "0")),
            conf.get("spark.master", ""), _code_version())]
    return spark.createDataFrame(
        row, ("config_hash string, app_name string, num_buckets int, "
              "num_partitions int, shuffle_partitions int, master string, "
              "code_version string")
    ).withColumn("created_at", F.current_timestamp())


def commit_run_meta(spark: SparkSession, checkpoint_path: str,
                    storage: StorageAdapter, app_name: str,
                    num_buckets: int, num_partitions: int) -> None:
    """Append this run's meta row, enforcing key-universe continuity:
    raises ValueError when an existing meta table was written with a
    different ``num_buckets`` (resuming into a different partition_key
    space corrupts both the anti-join and the keyed sink)."""
    existing = storage.read(spark, meta_path(checkpoint_path))
    if existing is not None:
        prev = (existing.orderBy(F.col("created_at").desc())
                .select("num_buckets").limit(1).collect())
        if prev and int(prev[0]["num_buckets"]) != int(num_buckets):
            raise ValueError(
                f"checkpoint {checkpoint_path} was written with "
                f"num_buckets={int(prev[0]['num_buckets'])}; resuming "
                f"with num_buckets={num_buckets} would change the "
                "partition_key universe — pass the original value")
    storage.append(
        run_meta_row(spark, app_name, num_buckets, num_partitions),
        meta_path(checkpoint_path))
