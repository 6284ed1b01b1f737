"""Custom stateful streaming operators (applyInPandasWithState).

The batch pipeline dedups work via the checkpoint anti-join; on a continuous
crawl stream the equivalent is cross-micro-batch state: a url seen in any
earlier micro-batch (or before a restart — state lives in the streaming
checkpoint) must not re-extract.

State design for scale: keys are url-hash BUCKETS (not urls), so the state
store holds `num_buckets` rows, each carrying the insertion-ordered array
of 64-bit url hashes seen in that bucket — bounded at
``max_state_per_bucket`` with oldest-first eviction, so total state is
O(num_buckets * cap) FOREVER, not O(urls ever seen).  The semantic is a
dedup HORIZON (standard for crawl dedup): a url re-arriving after its hash
was evicted is treated as new.  At larger horizons this moves to a RocksDB
state store + bloom-style pruning; the operator shape (grouped state, hash
membership, first-seen emission, bounded eviction) is identical.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = ("bucket int, url string, warc_ts timestamp, "
                       "html binary, text string, lang string")
DEDUP_STATE_SCHEMA = "seen array<long>"


ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")


def use_rocksdb_state(spark) -> None:
    """Switch subsequently-started streaming queries to the RocksDB state
    store (ships with Spark ≥3.2): state lives on local disk with
    changelog checkpointing instead of in executor heap, which is the
    right provider once the dedup horizon is sized for a real crawl
    (num_buckets × max_state_per_bucket hashes ≫ what an HDFS-backed
    in-memory map should hold).  Must be called BEFORE `.start()` — the
    provider is resolved per query at stream start and is then pinned in
    the checkpoint."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   ROCKSDB_PROVIDER)


def _url_hash(url: str) -> int:
    # cheap deterministic 63-bit hash, stable across workers/restarts
    h = 1469598103934665603
    for b in url.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0x7FFFFFFFFFFFFFFF
    return h


def _make_dedup_group(cap: int):
    """Build the grouped-state function with a bounded per-bucket state:
    hashes are kept in insertion order and the OLDEST are evicted once the
    bucket exceeds `cap`, so state size per bucket is O(cap) regardless of
    how many micro-batches the stream has processed."""

    def _dedup_group(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                     state: GroupState) -> Iterator[pd.DataFrame]:
        order = list(state.get[0]) if state.exists else []
        seen = set(order)
        cols = ["bucket", "url", "warc_ts", "html", "text", "lang"]
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            mask = []
            for url in pdf["url"]:
                h = _url_hash(url)
                if h in seen:
                    mask.append(False)
                else:
                    seen.add(h)
                    order.append(h)
                    mask.append(True)
            kept = pdf.loc[mask, :]
            if len(kept):
                yield kept[cols]
        if len(order) > cap:
            order = order[len(order) - cap:]  # oldest-first eviction
        state.update((order,))

    return _dedup_group


def dedup_urls_stateful(pages_stream: DataFrame,
                        num_buckets: int = 64,
                        max_state_per_bucket: int = 1_000_000) -> DataFrame:
    """First-seen-wins url dedup across micro-batches and restarts, within
    a bounded dedup horizon of `num_buckets * max_state_per_bucket` urls.

    Grouping by hash bucket keeps state ROW count at num_buckets and the
    shuffle key low-cardinality; oldest-first eviction inside each bucket
    keeps state SIZE at O(max_state_per_bucket) per row (round 1 grew it
    without bound).  Membership checks are in-memory set lookups over the
    restored state.
    """
    keyed = pages_stream.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets))
        .cast("int"))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _make_dedup_group(max_state_per_bucket),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
