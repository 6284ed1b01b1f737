"""Event-time windowed aggregation with watermark (late-data handling).

Crawl-ops view of the extraction lineage as a stream: per event-time window
and language, how many documents/pages flowed, how many failed.  The
watermark bounds state: windows older than the allowed lateness finalize
and evict; later-than-watermark records drop (counted by Spark's
numDroppedRecords metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_lineage(pages_stream: DataFrame,
                     window_duration: str = "10 minutes",
                     watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time (warc_ts) window counts per language.

    Pure built-in streaming aggregation: watermark → groupBy(window, lang)
    → counts; map-side partial aggregation and state-store eviction come
    free from Spark.
    """
    return (
        pages_stream
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration).alias("w"),
                 F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.length(F.col("html"))).alias("bytes"),
        )
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "lang", "docs", "bytes")
    )
