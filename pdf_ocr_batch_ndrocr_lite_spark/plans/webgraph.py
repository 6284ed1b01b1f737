"""Composed host-level webgraph job: resolve links → eTLD+1 edges →
fixed-point PageRank/TrustRank — the source-quality signal a crawl
curation pipeline ranks domains by (Common-Crawl publishes exactly this
per host/domain).

Barrier discipline (BASELINE.md r8): the RFC-3986 resolver plus the
DOUBLE full-PSL cascade exceeds the 64KB whole-stage-codegen method
budget, and pagerank would additionally inline that tree into
nodes/outdeg/cedges and every rank round — so each stage materializes
before the next consumes it.  ``scratch_dir`` uses parquet (required on
a real cluster: executors must be able to re-read it); on local masters
the caller may omit it and executor-local ``localCheckpoint`` is used
instead.

Scale shape: every stage is partition-parallel (projection / combining
agg / keyed join); the only driver-side state is pagerank's scalar node
count.  The reference has no graph surface (it delegates ranking to
whatever crawl produced its inputs) — this is the training-data
extension's source-quality layer over the same pages table the
extraction pipeline reads.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import linkgraph as lg


def run_webgraph(pages: DataFrame, html_col: str = "html",
                 url_col: str = "url", iterations: int = 3,
                 redistribute_dangling: bool = False,
                 drop_self: bool = True, psl: bool = True,
                 scratch_dir: Optional[str] = None,
                 seeds: Optional[DataFrame] = None):
    """(ranks, counts): host-level rank table (host, rank) over the
    pages table's anchor graph, plus per-stage row counts.

    ``pages``: the standard pages table (html may be binary — decoded
    as UTF-8 here, matching the corpus schema).  ``seeds``: optional
    one-column frame of trusted HOSTS (registrable domains) → TrustRank.
    ``psl=False`` ranks raw hostnames instead of registrable domains.
    """
    spark = pages.sparkSession
    counts: dict = {}

    def _barrier(df: DataFrame, name: str) -> DataFrame:
        if scratch_dir is None:
            return df.localCheckpoint(eager=False)
        df.write.mode("overwrite").parquet(f"{scratch_dir}/{name}")
        return spark.read.parquet(f"{scratch_dir}/{name}")

    html = F.col(html_col)
    if isinstance(pages.schema[html_col].dataType, T.BinaryType):
        html = html.cast("string")
    src = pages.select(F.col(url_col).alias("url"),
                       html.alias("html"))

    links = _barrier(lg.resolve_links(src), "links")
    counts["links"] = links.count()
    edges = _barrier(
        lg.host_edges(links, psl=psl, drop_self=drop_self), "edges")
    counts["host_edges"] = edges.count()
    if counts["host_edges"] == 0:
        # a corpus with no (inter-host) anchors has no graph to rank —
        # an empty typed result beats pagerank's empty-node error for a
        # batch job that may legitimately see anchor-free shards
        return (spark.createDataFrame([], "host string, rank bigint"),
                counts)
    ranks = lg.pagerank(
        edges, iterations=iterations, src_col="src_host",
        dst_col="dst_host", key_type=None, seeds=seeds,
        redistribute_dangling=redistribute_dangling,
        scratch_dir=(f"{scratch_dir}/pr" if scratch_dir else None))
    return ranks.select(F.col("id").alias("host"), "rank"), counts
