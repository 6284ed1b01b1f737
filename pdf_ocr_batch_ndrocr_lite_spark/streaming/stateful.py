"""Custom stateful streaming operators (applyInPandasWithState).

The batch pipeline dedups work via the checkpoint anti-join; on a continuous
crawl stream the equivalent is cross-micro-batch state: a url seen in any
earlier micro-batch (or before a restart — state lives in the streaming
checkpoint) must not re-extract.

State design for scale: keys are url-hash BUCKETS (not urls), so the state
store holds `num_buckets` rows, each carrying the sorted array of 64-bit
url hashes seen in that bucket.  At 10^9 urls/bucket-shard this moves to a
RocksDB state store + bloom-style pruning; the operator shape (grouped
state, hash membership, first-seen emission) is identical.
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


def _url_hash(url: str) -> int:
    # cheap deterministic 63-bit hash, stable across workers/restarts
    h = 1469598103934665603
    for b in url.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0x7FFFFFFFFFFFFFFF
    return h


def _dedup_group(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
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
                mask.append(True)
        kept = pdf.loc[mask, :]
        if len(kept):
            yield kept[cols]
    state.update((sorted(seen),))


def dedup_urls_stateful(pages_stream: DataFrame,
                        num_buckets: int = 64) -> DataFrame:
    """First-seen-wins url dedup across micro-batches and restarts.

    Grouping by hash bucket keeps state rows bounded (num_buckets) and the
    shuffle key low-cardinality; within a bucket membership checks are
    in-memory set lookups over the restored state.
    """
    keyed = pages_stream.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets))
        .cast("int"))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
