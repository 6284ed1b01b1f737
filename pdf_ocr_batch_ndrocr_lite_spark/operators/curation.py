"""Corpus-curation operators for training-data pipelines.

URL canonicalization (dedup pre-key) and per-domain caps (source diversity)
— standard Common-Crawl curation steps.  All JVM-side expressions with exact
ANSI-SQL twins for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization (fixed, frozen list).
_TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonicalize_url(url_col):
    """Canonical url: lowercase scheme+host, strip fragment, strip tracking
    params, collapse leftover '?&'/'&&', drop trailing '?', trailing slash.

    Chain of regexp_replace — Catalyst-evaluated, reproducible in any
    regex-capable SQL engine."""
    c = url_col
    # lowercase scheme://host (first path slash onwards untouched)
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z]+://[^/]+)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z]+://[^/]+", ""),
    )
    c = F.regexp_replace(c, r"#.*$", "")                 # fragment
    c = F.regexp_replace(c, _TRACKING_PARAM_RE, "")      # tracking params
    c = F.regexp_replace(c, r"\?&+", "?")                # ?& -> ?
    c = F.regexp_replace(c, r"&&+", "&")                 # && -> &
    c = F.regexp_replace(c, r"[?&]$", "")                # dangling ? / &
    c = F.regexp_replace(c, r"/$", "")                   # trailing slash
    return c


def extract_domain(url_col):
    """Registrable-host extraction (host only; PSL-aware eTLD+1 would slot
    in here on a cluster with the dependency)."""
    return F.lower(F.regexp_extract(url_col, r"^[a-zA-Z]+://([^/:]+)", 1))


def per_domain_cap(docs: DataFrame, url_col: str = "url", cap: int = 3,
                   order_col: str = "url") -> DataFrame:
    """Keep at most `cap` documents per domain (deterministic order).

    Window row_number per domain — one shuffle on the domain key; skewed
    mega-domains are exactly what the cap removes, so the shuffle's own skew
    is self-limiting (only `cap` rows per key survive the window; AQE handles
    the sort-side skew)."""
    domain = extract_domain(F.col(url_col))
    w = Window.partitionBy(domain).orderBy(order_col)
    return (
        docs.withColumn("domain", domain)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
