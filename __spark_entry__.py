"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction pipeline over sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing); oracles are ANSI SQL for DuckDB over
the same parquet tables.

Float discipline for value-hash parity: double sums go through
DECIMAL(18,2) (exact, order-independent) in BOTH engines; single IEEE
divisions are bitwise-identical across engines; ANN queries emit integer
(id, rank) pairs only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the engine package lives next to this file; make the import robust to the
# caller's cwd / import mechanism
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.operators import (
    asof as ao,
    curation as cu,
    dedup as dd,
    multimodal as mm,
    rangejoin as rj,
    similarity as sim,
    sketches as sk,
    textstats as ts,
)
from pdf_ocr_batch_ndrocr_lite_spark.operators import extract as ex


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# entry: flagship query (smoke check at sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Wrap sf0.001 documents as Common-Crawl-style pages and run the full
    extraction pipeline (name-rule filter → salted repartition → vectorized
    dispatcher)."""
    docs = _read(spark, "/root/testdata/sf0.001", "documents")
    pages = docs.select(
        F.concat(F.lit("https://example.org/doc/"), F.col("doc_id"))
        .alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><nav><a href='/x'>nav</a></nav>"
                           "<div id='main'><p>"),
                     F.col("text"), F.lit("</p></div></body></html>")),
            "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    return ex.run_extraction(pages)


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------


def _q01_pricing_rollup(spark, sf_dir):
    """A1 conditional-aggregation counters (TPC-H Q1 shape)."""
    li = _read(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double")
            .alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double")
            .alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .alias("n_returned"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q02_name_rule_filter(spark, sf_dir):
    """F2 name-rule RLike skip filter (app.py:87,1306-1313) over a corpus
    column: negative regex filter + per-lang counts."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.filter(~F.col("source").rlike(r"_ocr(_\d{3,})?$"))
        .filter(F.col("text").rlike(r"\bspark\b"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang")
    )


def _q03_threshold_filter(spark, sf_dir):
    """F3 text-layer threshold predicate analogue (cumulative chars>=10)."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("n_chars") >= 100, 1).otherwise(0))
            .alias("has_text"),
            F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
            .alias("needs_ocr"),
        )
        .orderBy("lang")
    )


def _q04_first_wins_dedup(spark, sf_dir):
    """A3 first-wins dedup via row_number window (app.py:1705-1725)."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    )


def _q05_anti_join_resume(spark, sf_dir):
    """Checkpoint-resume left-anti join shape (S10/idempotency)."""
    cust = _read(spark, sf_dir, "customer")
    big = _read(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def _q06_broadcast_dim_join(spark, sf_dir):
    """Broadcast dimension join (J2 page-zip analogue): lineitem ⋈ part."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").alias("revenue"),
        )
        .orderBy("p_brand")
    )


def _q07_corpus_sort(spark, sf_dir):
    """O1 deterministic corpus ordering: lower(key) sort + limit."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "source", F.lower(F.col("source")).alias("lsrc"))
        .orderBy("lsrc", "doc_id")
        .limit(20)
    )


def _q08_regex_extract(spark, sf_dir):
    """T9 regex field extraction (page-number pattern analogue) on JSON-ish
    props."""
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
        .alias("k_val"),
    ).orderBy("event_id")


def _q09_split_stats(spark, sf_dir):
    """A8 whitespace split stats: word count, first/last word."""
    docs = _read(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    return docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
    ).orderBy("doc_id")


def _q10_rollup_lineage(spark, sf_dir):
    """S9 lineage metrics rollup: 2-level hierarchy via ROLLUP."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.rollup("lang")
        .agg(F.count(F.lit(1)).alias("docs"),
             F.sum("n_chars").alias("chars"))
        .orderBy(F.col("lang").asc_nulls_first())
    )


def _q11_dedup_exact(spark, sf_dir):
    """Exact dedup by content digest (hash-groupBy) on a 40-char prefix."""
    docs = _read(spark, sf_dir, "documents")
    pref = docs.select("doc_id",
                       F.substring(F.col("text"), 1, 40).alias("text"))
    return dd.exact_duplicates(pref).orderBy("text_md5")


def _q12_minhash_signatures(spark, sf_dir):
    """MinHash signatures (4 hashes, 3-word shingles) for doc_id < 200."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dd.minhash_signatures(docs, num_hashes=4, k=3).orderBy("doc_id")


def _q13_jaccard_pairs(spark, sf_dir):
    """N-gram Jaccard near-dup pairs over doc_id < 120."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    # raw double: single IEEE division of the same ints is bitwise-identical
    # across engines, unlike round(double) whose algorithm differs
    return (
        dd.ngram_jaccard_pairs(docs, k=2, threshold=0.05)
        .select("a_id", "b_id", "n_common", "jaccard")
        .orderBy("a_id", "b_id")
    )


def _q14_simhash(spark, sf_dir):
    """SimHash 64-bit fingerprints (xxhash64 — Spark-only, rows check)."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dd.simhash(docs).orderBy("doc_id")


def _query_vec(spark, sf_dir):
    row = (_read(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") == 0).select("embedding").collect())
    return [float(v) for v in row[0][0]]


def _q15_ann_topk(spark, sf_dir):
    """Brute-force cosine top-10 vs vec 0 (integer id/rank output)."""
    emb = _read(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    top = sim.brute_force_topk(emb, q, k=10)
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)) \
        .select("vec_id", "rank").orderBy("rank")


def _q16_ann_topk_bucket(spark, sf_dir):
    """Bucketed (IVF-style) top-3 per label vs vec 0."""
    emb = _read(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    return sim.topk_per_bucket(emb, q, k=3, bucket_col="label") \
        .select("label", "vec_id", "rank").orderBy("label", "rank")


def _q17_lang_id(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return (
        ts.lang_id(docs)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang_pred")
    )


def _q18_quality_score(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return ts.quality_score(docs).orderBy("doc_id")


def _q19_token_counts(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return ts.token_counts(docs).orderBy("doc_id")


def _q20_fingerprint(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return ts.fingerprint(docs, window=5).orderBy("doc_id")


def _q21_media_summary(spark, sf_dir):
    docs = _read(spark, sf_dir, "documents")
    return mm.media_summary(mm.attach_media(docs)).orderBy("kind")


def _q22_media_features(spark, sf_dir):
    """Multimodal decode plumbing (stubbed decode — Spark-only rows check)."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    feats = mm.media_features(mm.attach_media(docs))
    return feats.select("media_id", "kind", "n_bytes", "sha1", "n_frames") \
        .orderBy("media_id")


def _q23_events_window(spark, sf_dir):
    """Tumbling-hour windowed aggregation (streaming-shape over batch)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                   "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


def _q24_extraction_pipeline(spark, sf_dir):
    """Flagship extraction over documents-as-pages (non-SQL; rows check)."""
    docs = _read(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://example.org/doc/"), F.col("doc_id"))
        .alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><nav><a href='/x'>n</a></nav>"
                           "<div id='main'><p>"),
                     F.col("text"), F.lit("</p></div></body></html>")),
            "utf-8").alias("html"),
        F.col("text"), F.col("lang"),
    )
    res = ex.run_extraction(pages)
    return res.select("url", "action", "extracted_text").orderBy("url")


def _q25_priority_merge(spark, sf_dir):
    """A7 format-priority merge shape: first non-empty wins via COALESCE
    (JSON > XML > TXT analogue, app.py:1662-1687)."""
    docs = _read(spark, sf_dir, "documents")
    a = F.when(F.col("n_chars") >= 300, F.col("source"))  # "structured" hit
    b = F.when(F.col("n_chars") >= 150, F.concat(F.lit("xml:"),
                                                 F.col("lang")))
    c = F.lit("txt:fallback")
    return docs.select(
        "doc_id",
        F.coalesce(a, b, c).alias("merged_source"),
    ).orderBy("doc_id")


def _q26_posexplode(spark, sf_dir):
    """A8 TXT page-splitting shape: split + posexplode with positions
    (app.py:1790-1823)."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    return (
        docs.select("doc_id", F.posexplode(words).alias("pos", "word"))
        .filter(F.col("pos") < 5)
        .orderBy("doc_id", "pos")
    )


def _q27_sessionization(spark, sf_dir):
    """Streaming-shaped sessionization over batch: 30-min-gap sessions per
    user via lag window + running sum."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    with_new = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = with_new.withColumn(
        "session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"),
             F.max("n_events").alias("max_session_events"))
        .orderBy("user_id")
    )


def _q28_cube_metrics(spark, sf_dir):
    """Metrics reporting over CUBE(lang, source) — grouping-set rollups for
    the lineage dashboard (SURVEY §2.4 'rollup available')."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.cube("lang", "source")
        .agg(F.count(F.lit(1)).alias("docs"),
             F.sum("n_chars").alias("chars"))
        .orderBy(F.col("lang").asc_nulls_first(),
                 F.col("source").asc_nulls_first())
    )


def _q29_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs within coarse (label) buckets —
    the IVF-style scale path; integer pair output for exact hashing."""
    emb = _read(spark, sf_dir, "embeddings")
    emb = emb.withColumn(
        "embedding", F.transform(F.col("embedding"),
                                 lambda x: x.cast("double")))
    pairs = dd.embedding_near_dup_pairs(emb, threshold=0.35)
    return pairs.select("a_id", "b_id").orderBy("a_id", "b_id")


def _q30_lsh_candidates(spark, sf_dir):
    """MinHash banded-LSH candidate pairs (2 bands x 2 rows, 3-shingles)."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dd.minhash_lsh_candidates(docs, num_hashes=4, bands=2, k=3) \
        .orderBy("a_id", "b_id")


def _synth_urls(spark, sf_dir):
    """Deterministic messy urls over documents (the table has no url col);
    built identically in the SQL oracle."""
    docs = _read(spark, sf_dir, "documents")
    suffix = (
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("?utm_source=feed&id="), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 1, F.lit("?id=1&utm_campaign=x"))
        .when(F.col("doc_id") % 5 == 2, F.lit("#section-2"))
        .when(F.col("doc_id") % 5 == 3, F.lit("/"))
        .otherwise(F.lit(""))
    )
    url = F.concat(F.lit("HTTPS://WWW."), F.col("source"),
                   F.lit(".Example.ORG/p/"), F.col("doc_id"), suffix)
    return docs.select("doc_id", url.alias("url"))


def _q31_url_canonicalize(spark, sf_dir):
    """URL canonicalization: scheme/host case-fold, fragment + tracking-param
    strip, trailing cleanup — the dedup pre-key for crawl corpora."""
    urls = _synth_urls(spark, sf_dir)
    return urls.select(
        "doc_id",
        cu.canonicalize_url(F.col("url")).alias("canon_url"),
        cu.extract_domain(F.col("url")).alias("domain"),
    ).orderBy("doc_id")


def _q32_domain_cap(spark, sf_dir):
    """Per-domain document cap (source-diversity curation)."""
    urls = _synth_urls(spark, sf_dir)
    # spread over 10 synthetic domains so the cap actually filters
    urls = urls.withColumn(
        "url",
        F.concat(F.lit("https://d"), (F.col("doc_id") % 10),
                 F.lit(".example.org/p/"), F.col("doc_id")))
    capped = cu.per_domain_cap(urls, cap=3, order_col="doc_id")
    return capped.select("doc_id", "domain").orderBy("doc_id")


def _q33_salted_counts(spark, sf_dir):
    """Two-phase salted aggregation for skewed keys — identical result to a
    plain GROUP BY (the oracle), different physical shape."""
    ev = _read(spark, sf_dir, "events")
    return dd.salted_groupby_counts(ev, "event_type", "value", salt_n=16) \
        .orderBy("event_type")


def _q34_minhash_dedup(spark, sf_dir):
    """Composed near-dup removal: LSH candidates → Jaccard verify → drop
    losers (lower id survives)."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    kept = dd.minhash_dedup(docs, num_hashes=4, bands=2, k=2,
                            jaccard_threshold=0.08)
    return kept.select("doc_id").orderBy("doc_id")


def _q35_asof_join(spark, sf_dir):
    """As-of join (custom operator: Spark built-ins composition, DuckDB
    native ASOF JOIN as the oracle): for each click, the latest preceding
    error by the same user."""
    ev = _read(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error") \
        .select(F.col("event_id").alias("err_id"), "user_id", "ts")
    joined = ao.asof_join(clicks, errors, ["user_id"], "ts", "ts",
                          ["err_id"])
    return joined.select("event_id", "user_id",
                         F.col("asof_err_id").alias("last_err_id")) \
        .orderBy("event_id")


_PRICE_BANDS = [(0, 0.0, 5_000.0), (1, 5_000.0, 20_000.0),
                (2, 20_000.0, 60_000.0), (3, 60_000.0, 120_000.0)]


def _q36_range_join(spark, sf_dir):
    """Bucketized range join (custom operator): lineitem prices into
    variable-width bands; oracle is the plain theta join."""
    li = _read(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    bands = spark.createDataFrame(_PRICE_BANDS, "band_id int, lo double, hi double")
    joined = rj.range_join_bucketed(li, bands, "l_extendedprice",
                                    "lo", "hi", bucket_width=5_000.0)
    return (
        joined.groupBy("band_id")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .orderBy("band_id")
    )


def _q37_hypertable_rollup(spark, sf_dir):
    """Hypertable-style multi-resolution time rollup: one pass producing
    (type, day, hour), (type, day), (type), () aggregation levels."""
    ev = _read(spark, sf_dir, "events")
    ev = ev.withColumn("day", F.date_trunc("day", F.col("ts"))) \
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
    return (
        ev.rollup("event_type", "day", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("event_type").asc_nulls_first(),
                 F.col("day").asc_nulls_first(),
                 F.col("hour").asc_nulls_first())
    )


def _q38_kmv_sketch(spark, sf_dir):
    """Deterministic KMV distinct-count sketch (engine-portable, unlike
    HLL): distinct users per event type."""
    ev = _read(spark, sf_dir, "events")
    return sk.kmv_distinct(ev, ["event_type"], "user_id", k=64) \
        .orderBy("event_type")


def _q39_rolling_hash(spark, sf_dir):
    """Polynomial rolling-hash fingerprint (exact int64 fold, portable)."""
    docs = _read(spark, sf_dir, "documents")
    return ts.rolling_hash(docs, prefix_chars=256).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_rollup": _q01_pricing_rollup,
        "q02_name_rule_filter": _q02_name_rule_filter,
        "q03_threshold_filter": _q03_threshold_filter,
        "q04_first_wins_dedup": _q04_first_wins_dedup,
        "q05_anti_join_resume": _q05_anti_join_resume,
        "q06_broadcast_dim_join": _q06_broadcast_dim_join,
        "q07_corpus_sort": _q07_corpus_sort,
        "q08_regex_extract": _q08_regex_extract,
        "q09_split_stats": _q09_split_stats,
        "q10_rollup_lineage": _q10_rollup_lineage,
        "q11_dedup_exact": _q11_dedup_exact,
        "q12_minhash_signatures": _q12_minhash_signatures,
        "q13_jaccard_pairs": _q13_jaccard_pairs,
        "q14_simhash": _q14_simhash,
        "q15_ann_topk": _q15_ann_topk,
        "q16_ann_topk_bucket": _q16_ann_topk_bucket,
        "q17_lang_id": _q17_lang_id,
        "q18_quality_score": _q18_quality_score,
        "q19_token_counts": _q19_token_counts,
        "q20_fingerprint": _q20_fingerprint,
        "q21_media_summary": _q21_media_summary,
        "q22_media_features": _q22_media_features,
        "q23_events_window": _q23_events_window,
        "q24_extraction_pipeline": _q24_extraction_pipeline,
        "q25_priority_merge": _q25_priority_merge,
        "q26_posexplode": _q26_posexplode,
        "q27_sessionization": _q27_sessionization,
        "q28_cube_metrics": _q28_cube_metrics,
        "q29_embedding_near_dup": _q29_embedding_near_dup,
        "q30_lsh_candidates": _q30_lsh_candidates,
        "q31_url_canonicalize": _q31_url_canonicalize,
        "q32_domain_cap": _q32_domain_cap,
        "q33_salted_counts": _q33_salted_counts,
        "q34_minhash_dedup": _q34_minhash_dedup,
        "q35_asof_join": _q35_asof_join,
        "q36_range_join": _q36_range_join,
        "q37_hypertable_rollup": _q37_hypertable_rollup,
        "q38_kmv_sketch": _q38_kmv_sketch,
        "q39_rolling_hash": _q39_rolling_hash,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles.  Shingle machinery shared by q12/q13/q20.
# ---------------------------------------------------------------------------

_SHINGLE_CTE = """
words AS (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
    FROM documents {where}
),
starts AS (
    SELECT doc_id, ws,
           unnest(range(1, greatest(len(ws) - {km1}, 1) + 1)) AS i
    FROM words
),
sh AS (
    SELECT doc_id, array_to_string(ws[i : i + {km1}], ' ') AS shingle
    FROM starts
)
"""


def _shingle_cte(where: str, k: int) -> str:
    return _SHINGLE_CTE.format(where=where, km1=k - 1)


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS sum_qty,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS sum_base_price,
                   COUNT(*) AS count_order,
                   CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_returned
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2024-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q02_name_rule_filter": r"""
            SELECT lang, COUNT(*) AS n_docs
            FROM documents
            WHERE NOT regexp_matches(source, '_ocr(_\d{3,})?$')
              AND regexp_matches(text, '\bspark\b')
            GROUP BY lang ORDER BY lang
        """,
        "q03_threshold_filter": """
            SELECT lang, COUNT(*) AS total,
                   CAST(SUM(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END)
                        AS BIGINT) AS has_text,
                   CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)
                        AS BIGINT) AS needs_ocr
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "q04_first_wins_dedup": """
            SELECT user_id, event_type, event_id FROM (
                SELECT user_id, event_type, event_id,
                       ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ) WHERE rn = 1 ORDER BY user_id, event_type
        """,
        "q05_anti_join_resume": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 400000)
            ORDER BY c_custkey
        """,
        "q06_broadcast_dim_join": """
            SELECT p_brand, COUNT(*) AS n_items,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "q07_corpus_sort": """
            SELECT doc_id, source, lower(source) AS lsrc
            FROM documents ORDER BY lsrc, doc_id LIMIT 20
        """,
        "q08_regex_extract": r"""
            SELECT event_id,
                   CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT)
                       AS k_val
            FROM events ORDER BY event_id
        """,
        "q09_split_stats": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            )
            SELECT doc_id, len(ws) AS n_words,
                   ws[1] AS first_word, ws[len(ws)] AS last_word
            FROM w ORDER BY doc_id
        """,
        "q10_rollup_lineage": """
            SELECT lang, COUNT(*) AS docs,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM documents GROUP BY ROLLUP(lang)
            ORDER BY lang ASC NULLS FIRST
        """,
        "q11_dedup_exact": """
            SELECT md5(substring(text, 1, 40)) AS text_md5,
                   COUNT(*) AS dup_count, MIN(doc_id) AS keep_id
            FROM documents
            GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY text_md5
        """,
        "q12_minhash_signatures": "WITH " + _shingle_cte(
            "WHERE doc_id < 200", 3) + """
            SELECT doc_id,
                   MIN(md5('0:' || shingle)) AS h0,
                   MIN(md5('1:' || shingle)) AS h1,
                   MIN(md5('2:' || shingle)) AS h2,
                   MIN(md5('3:' || shingle)) AS h3
            FROM sh GROUP BY doc_id ORDER BY doc_id
        """,
        "q13_jaccard_pairs": "WITH " + _shingle_cte(
            "WHERE doc_id < 120", 2) + """,
            dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                       COUNT(*) AS n_common
                FROM dsh a JOIN dsh b ON a.shingle = b.shingle
                WHERE a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT i.a_id, i.b_id, i.n_common,
                   CAST(i.n_common AS DOUBLE)
                       / (sa.n_sh + sb.n_sh - i.n_common) AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.a_id
            JOIN sizes sb ON sb.doc_id = i.b_id
            WHERE CAST(i.n_common AS DOUBLE)
                  / (sa.n_sh + sb.n_sh - i.n_common) >= 0.05
            ORDER BY a_id, b_id
        """,
        "q15_ann_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0),
            scored AS (
                SELECT vec_id,
                       list_cosine_similarity(embedding::DOUBLE[], q.qv)
                           AS cosine
                FROM embeddings, q
            )
            SELECT vec_id,
                   ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rank
            FROM scored ORDER BY cosine DESC, vec_id LIMIT 10
        """,
        "q16_ann_topk_bucket": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0),
            scored AS (
                SELECT e.label, e.vec_id,
                       list_cosine_similarity(e.embedding::DOUBLE[], q.qv)
                           AS cosine
                FROM embeddings e, q
            )
            SELECT label, vec_id, rank FROM (
                SELECT label, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY label
                                          ORDER BY cosine DESC, vec_id)
                           AS rank
                FROM scored
            ) WHERE rank <= 3 ORDER BY label, rank
        """,
        "q17_lang_id": r"""
            WITH feats AS (
                SELECT doc_id,
                       len(regexp_extract_all(text,
                           '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}]')) AS cjk,
                       length(text) AS n,
                       len(regexp_extract_all(lower(text),
                           '\b(the|and|of|to|in|is|for)\b')) AS en_n,
                       len(regexp_extract_all(lower(text),
                           '\b(der|die|und|das|ist|nicht|ein)\b')) AS de_n,
                       len(regexp_extract_all(lower(text),
                           '\b(el|la|de|que|y|los|para)\b')) AS es_n
                FROM documents
            ),
            pred AS (
                SELECT doc_id,
                       CASE WHEN cjk * 4 >= n THEN 'cjk'
                            WHEN greatest(en_n, de_n, es_n) = 0 THEN 'unknown'
                            WHEN en_n >= de_n AND en_n >= es_n THEN 'en'
                            WHEN de_n >= es_n THEN 'de'
                            ELSE 'es' END AS lang_pred
                FROM feats
            )
            SELECT lang_pred, COUNT(*) AS n FROM pred
            GROUP BY lang_pred ORDER BY lang_pred
        """,
        "q18_quality_score": r"""
            WITH f AS (
                SELECT doc_id,
                       length(text) AS n_chars_obs,
                       len(list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '')) AS n_words,
                       len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
                       len(regexp_extract_all(lower(text),
                           '\b(the|and|of|to|in|is|for)\b')) AS n_stop
                FROM documents WHERE doc_id < 200
            )
            SELECT doc_id, n_chars_obs, n_words,
                   CASE WHEN n_chars_obs > 0
                        THEN CAST(n_punct AS DOUBLE) / n_chars_obs
                        ELSE 0.0 END AS punct_ratio,
                   CASE WHEN n_words > 0
                        THEN CAST(n_stop AS DOUBLE) / n_words
                        ELSE 0.0 END AS stopword_ratio,
                   least(n_words / 100.0, 1.0) * 0.4
                     + least(CASE WHEN n_words > 0
                                  THEN CAST(n_stop AS DOUBLE) / n_words
                                  ELSE 0.0 END * 5.0, 1.0) * 0.4
                     + CASE WHEN n_words > 0
                                 AND CAST(n_chars_obs AS DOUBLE)/n_words >= 3
                                 AND CAST(n_chars_obs AS DOUBLE)/n_words <= 12
                            THEN 0.2 ELSE 0.0 END AS quality
            FROM f ORDER BY doc_id
        """,
        "q19_token_counts": r"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '')) AS ws_tokens,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "q20_fingerprint": "WITH " + _shingle_cte("", 5) + """
            SELECT doc_id, MIN(md5(shingle)) AS fingerprint
            FROM sh GROUP BY doc_id ORDER BY doc_id
        """,
        "q21_media_summary": """
            SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   COUNT(*) AS n_items,
                   CAST(SUM(octet_length(encode(text))) AS BIGINT)
                       AS total_bytes,
                   CAST(SUM(length(text) * 10) AS BIGINT)
                       AS total_duration_ms
            FROM documents GROUP BY 1 ORDER BY kind
        """,
        "q23_events_window": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
                       AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY hour, event_type
        """,
        "q25_priority_merge": """
            SELECT doc_id,
                   COALESCE(CASE WHEN n_chars >= 300 THEN source END,
                            CASE WHEN n_chars >= 150 THEN 'xml:' || lang END,
                            'txt:fallback') AS merged_source
            FROM documents ORDER BY doc_id
        """,
        "q26_posexplode": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '') AS ws
                FROM documents WHERE doc_id < 50
            ),
            e AS (
                SELECT doc_id, ws,
                       unnest(range(1, len(ws) + 1)) AS i
                FROM w
            )
            SELECT doc_id, i - 1 AS pos, ws[i] AS word
            FROM e WHERE i <= 5 ORDER BY doc_id, pos
        """,
        "q27_sessionization": """
            WITH lagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN LAG(ts) OVER w IS NULL
                              OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
                SELECT user_id,
                       SUM(new_session) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING)
                           AS session_id
                FROM lagged
            ),
            per_session AS (
                SELECT user_id, session_id, COUNT(*) AS n_events
                FROM sess GROUP BY user_id, session_id
            )
            SELECT user_id, COUNT(*) AS n_sessions,
                   MAX(n_events) AS max_session_events
            FROM per_session GROUP BY user_id ORDER BY user_id
        """,
        "q28_cube_metrics": """
            SELECT lang, source, COUNT(*) AS docs,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM documents GROUP BY CUBE(lang, source)
            ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST
        """,
        "q29_embedding_near_dup": """
            WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                       FROM embeddings)
            SELECT a.vec_id AS a_id, b.vec_id AS b_id
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.35
            ORDER BY a_id, b_id
        """,
        "q30_lsh_candidates": "WITH " + _shingle_cte(
            "WHERE doc_id < 200", 3) + """,
            sig AS (
                SELECT doc_id,
                       MIN(md5('0:' || shingle)) AS h0,
                       MIN(md5('1:' || shingle)) AS h1,
                       MIN(md5('2:' || shingle)) AS h2,
                       MIN(md5('3:' || shingle)) AS h3
                FROM sh GROUP BY doc_id
            ),
            buckets AS (
                SELECT doc_id, 0 AS band, h0 || '|' || h1 AS key FROM sig
                UNION ALL
                SELECT doc_id, 1 AS band, h2 || '|' || h3 AS key FROM sig
            )
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM buckets a JOIN buckets b
              ON a.band = b.band AND a.key = b.key
            WHERE a.doc_id < b.doc_id
            ORDER BY a_id, b_id
        """,
        "q31_url_canonicalize": r"""
            WITH u AS (
                SELECT doc_id,
                       'HTTPS://WWW.' || source || '.Example.ORG/p/' ||
                       doc_id ||
                       CASE WHEN doc_id % 5 = 0
                                THEN '?utm_source=feed&id=' || doc_id
                            WHEN doc_id % 5 = 1 THEN '?id=1&utm_campaign=x'
                            WHEN doc_id % 5 = 2 THEN '#section-2'
                            WHEN doc_id % 5 = 3 THEN '/'
                            ELSE '' END AS url
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(regexp_replace(regexp_replace(
                       lower(regexp_extract(url, '^([a-zA-Z]+://[^/]+)', 1))
                       || regexp_replace(url, '^[a-zA-Z]+://[^/]+', '', 'g'),
                       '#.*$', '', 'g'),
                       '(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*', '', 'g'),
                       '\?&+', '?', 'g'),
                       '&&+', '&', 'g'),
                       '[?&]$', '', 'g'),
                       '/$', '', 'g') AS canon_url,
                   lower(regexp_extract(url, '^[a-zA-Z]+://([^/:]+)', 1))
                       AS domain
            FROM u ORDER BY doc_id
        """,
        "q32_domain_cap": """
            WITH u AS (
                SELECT doc_id,
                       'https://d' || (doc_id % 10) || '.example.org/p/' ||
                       doc_id AS url
                FROM documents
            ),
            ranked AS (
                SELECT doc_id,
                       lower(regexp_extract(url, '^[a-zA-Z]+://([^/:]+)', 1))
                           AS domain,
                       ROW_NUMBER() OVER (
                           PARTITION BY lower(regexp_extract(url,
                               '^[a-zA-Z]+://([^/:]+)', 1))
                           ORDER BY doc_id) AS rn
                FROM u
            )
            SELECT doc_id, domain FROM ranked WHERE rn <= 3
            ORDER BY doc_id
        """,
        "q33_salted_counts": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS total
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "q34_minhash_dedup": "WITH " + _shingle_cte(
            "WHERE doc_id < 120", 2) + """,
            sig AS (
                SELECT doc_id,
                       MIN(md5('0:' || shingle)) AS h0,
                       MIN(md5('1:' || shingle)) AS h1,
                       MIN(md5('2:' || shingle)) AS h2,
                       MIN(md5('3:' || shingle)) AS h3
                FROM sh GROUP BY doc_id
            ),
            buckets AS (
                SELECT doc_id, 0 AS band, h0 || '|' || h1 AS key FROM sig
                UNION ALL
                SELECT doc_id, 1 AS band, h2 || '|' || h3 AS key FROM sig
            ),
            cand AS (
                SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
                FROM buckets a JOIN buckets b
                  ON a.band = b.band AND a.key = b.key
                WHERE a.doc_id < b.doc_id
            ),
            dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM dsh
                      GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
                FROM dsh a JOIN dsh b ON a.shingle = b.shingle
                WHERE a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            losers AS (
                SELECT DISTINCT i.b_id
                FROM inter i
                JOIN sizes sa ON sa.doc_id = i.a_id
                JOIN sizes sb ON sb.doc_id = i.b_id
                JOIN cand c ON c.a_id = i.a_id AND c.b_id = i.b_id
                WHERE CAST(i.c AS DOUBLE)
                      / (sa.n_sh + sb.n_sh - i.c) >= 0.08
            )
            SELECT doc_id FROM documents
            WHERE doc_id < 120
              AND doc_id NOT IN (SELECT b_id FROM losers)
            ORDER BY doc_id
        """,
        "q35_asof_join": """
            WITH clicks AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'
            ),
            errors AS (
                SELECT event_id AS err_id, user_id, ts FROM events
                WHERE event_type = 'error'
            )
            SELECT c.event_id, c.user_id, e.err_id AS last_err_id
            FROM clicks c
            ASOF LEFT JOIN errors e
              ON c.user_id = e.user_id AND c.ts >= e.ts
            ORDER BY c.event_id
        """,
        "q36_range_join": """
            WITH bands(band_id, lo, hi) AS (
                VALUES (0, 0.0, 5000.0), (1, 5000.0, 20000.0),
                       (2, 20000.0, 60000.0), (3, 60000.0, 120000.0)
            )
            SELECT b.band_id, COUNT(*) AS n_items
            FROM lineitem l JOIN bands b
              ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
            GROUP BY b.band_id ORDER BY b.band_id
        """,
        "q37_hypertable_rollup": """
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   date_trunc('hour', ts) AS hour, COUNT(*) AS n
            FROM events
            GROUP BY ROLLUP(event_type, CAST(date_trunc('day', ts)
                                             AS TIMESTAMP),
                            date_trunc('hour', ts))
            ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST,
                     hour ASC NULLS FIRST
        """,
        "q38_kmv_sketch": """
            WITH h AS (
                SELECT DISTINCT event_type,
                       CAST(('0x' || substring(
                            md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
                           AS hv
                FROM events
            ),
            ranked AS (
                SELECT event_type, hv,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY hv) AS rn
                FROM h
            ),
            mins AS (SELECT event_type, hv, rn FROM ranked WHERE rn <= 64),
            agg AS (
                SELECT event_type, COUNT(*) AS n, MAX(hv) AS kth
                FROM mins GROUP BY event_type
            )
            SELECT event_type,
                   CASE WHEN n < 64 THEN n
                        ELSE CAST(FLOOR(63.0 / (CAST(kth AS DOUBLE)
                             / 1152921504606846976.0)) AS BIGINT)
                   END AS kmv_estimate,
                   n AS sketch_size
            FROM agg ORDER BY event_type
        """,
        "q39_rolling_hash": """
            SELECT doc_id,
                   list_reduce(
                     list_prepend(CAST(7 AS BIGINT),
                       list_transform(
                         string_split(substring(text, 1, 256), ''),
                         c -> CAST(unicode(c) AS BIGINT))),
                     (a, b) -> (a * 31 + b) % 288230376151711717) AS rhash
            FROM documents ORDER BY doc_id
        """,
        # q14_simhash: xxhash64 not available in DuckDB — rows-only check
        # q22_media_features: stubbed sha1 decode — rows-only check
        # q24_extraction_pipeline: full UDF pipeline — rows-only check
    }
