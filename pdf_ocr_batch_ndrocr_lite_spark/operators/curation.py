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


# ---------------------------------------------------------------------------
# Composed curation verdict: the full training-data keep/drop decision one
# pass of a CCNet/Gopher-style pipeline makes per document — exact dedup
# first (cheapest kill), then language, then composite quality, then
# n-gram repetition.  All three per-row signals are COLUMN expressions
# (textstats.lang_pred_col / quality_col / top_gram_frac_col) fused into
# ONE projection; the only data movement is the dedup window's single
# exchange on the text digest.  Plan: scan → project → one window — no
# joins (an earlier formulation joined three signal frames on doc_id:
# three full-corpus shuffles for row-local values).
# ---------------------------------------------------------------------------


def curation_verdict(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     min_quality: float = 0.45,
                     max_top_gram_frac: float = 0.10,
                     k: int = 2) -> DataFrame:
    """(id, keep, reason) per document.  Reason priority mirrors pipeline
    order: 'exact_dup' (not the first-seen copy of its text digest) >
    'lang' (language ID failed) > 'quality' (composite score below
    threshold) > 'repetition' (most-frequent k-gram share above
    threshold) > 'kept'."""
    from . import textstats as ts

    # the sorted-gram array is staged in its own projection: HOF
    # expressions are never CSE'd (SPARK-35410), and the fraction
    # references it twice (run fold + size)
    staged = docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("_md5"),
        ts.lang_pred_col(text_col).alias("lang_pred"),
        ts.quality_col(text_col).alias("quality"),
        ts.sorted_grams_col(text_col, k).alias("_g"),
    )
    # coalesce: a doc with no grams (NULL text → NULL fraction) must fall
    # through to 'kept' DETERMINISTICALLY, not via three-valued-logic
    # accident (NULL > threshold is NULL, which WHEN treats as false — the
    # coalesce makes the intent explicit and keeps the SQL oracle's
    # LEFT JOIN + COALESCE formulation bitwise-aligned)
    sig = staged.select(
        F.col(id_col), F.col("_md5"), F.col("lang_pred"), F.col("quality"),
        F.coalesce(ts.top_gram_frac_col(F.col("_g")), F.lit(0.0))
        .alias("top_gram_frac"),
    )
    w = Window.partitionBy("_md5").orderBy(F.col(id_col))
    v = sig.withColumn("_rn", F.row_number().over(w))
    reason = (
        F.when(F.col("_rn") > 1, F.lit("exact_dup"))
        .when(F.col("lang_pred") == "unknown", F.lit("lang"))
        .when(F.col("quality") < F.lit(float(min_quality)), F.lit("quality"))
        .when(F.col("top_gram_frac") > F.lit(float(max_top_gram_frac)),
              F.lit("repetition"))
        .otherwise(F.lit("kept"))
    )
    return v.select(
        F.col(id_col),
        (reason == F.lit("kept")).alias("keep"),
        reason.alias("reason"),
    )
