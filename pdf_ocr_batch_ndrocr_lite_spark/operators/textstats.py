"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

Everything is built from pyspark.sql.functions (JVM-side, whole-stage
codegen) so each operator has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Marker-word lists for the n-gram/stopword language heuristic.  Tiny by
# design: they broadcast as literals inside the regex, no dimension table.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "los", "para"],
}


def _sql_pat(pat: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal (Spark
    unescapes backslashes in '...' literals; DuckDB does not)."""
    return pat.replace("\\", "\\\\")


def _marker_count(text_col, words):
    pat = _sql_pat(r"\b(" + "|".join(words) + r")\b")
    # size(regexp_extract_all(...)) — supported by Spark and DuckDB alike;
    # explicit group 0 (Spark defaults to 1, DuckDB to 0).
    return F.size(F.expr(
        f"regexp_extract_all(lower({text_col}), '{pat}', 0)"))


def lang_pred_col(text_col: str = "text"):
    """Language-ID prediction as a pure COLUMN expression (composable into
    a fused signal projection — see `curation.curation_verdict`)."""
    cjk_hits = F.size(F.expr(
        f"regexp_extract_all({text_col}, "
        f"'[\\\\x{{3040}}-\\\\x{{30FF}}\\\\x{{4E00}}-\\\\x{{9FFF}}]', 0)"))
    counts = {lang: _marker_count(text_col, words)
              for lang, words in _LANG_MARKERS.items()}
    best = F.lit("unknown")
    best_n = F.lit(0)
    for lang in ["es", "de", "en"]:  # reverse priority; later wins ties
        n = counts[lang]
        best = F.when(n >= best_n, F.lit(lang)).otherwise(best)
        best_n = F.greatest(n, best_n)
    return F.when(cjk_hits * 4 >= F.length(F.col(text_col)), F.lit("cjk")) \
        .otherwise(F.when(best_n > 0, best).otherwise(F.lit("unknown")))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: CJK script ratio first, else the marker-word
    class with the highest hit count (ties resolve by fixed order en>de>es;
    no hits → 'unknown')."""
    return docs.select(F.col(id_col),
                       lang_pred_col(text_col).alias("lang_pred"))


def quality_col(text_col: str = "text"):
    """Composite quality score as a pure COLUMN expression."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    n_stop = _marker_count(text_col, _LANG_MARKERS["en"])
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    return (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.4
        + F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(0.2))
        .otherwise(F.lit(0.0))
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + composite
    score in [0,1].  Pure column arithmetic."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    n_punct = F.size(F.expr(
        f"regexp_extract_all({text_col}, '[.,;:!?]', 0)"))
    n_stop = _marker_count(text_col, _LANG_MARKERS["en"])
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    score = quality_col(text_col)
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_obs"),
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        # raw double, no round(): every term is the same IEEE op sequence in
        # the SQL oracle, so the unrounded value is bitwise-identical across
        # engines — round(double) is not (HALF_UP BigDecimal vs libm)
        score.alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword count (runs of letters,
    digits, or single non-space symbols — an upper-bound proxy for tokenizer
    load, computable engine-side at full scan speed)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
    bpe = F.size(F.expr(
        f"regexp_extract_all({text_col}, "
        f"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
    return docs.select(F.col(id_col), ws.alias("ws_tokens"),
                       bpe.alias("bpe_tokens"))


# Rolling-hash modulus: < 2^58 so acc*31 stays inside int64.
ROLLING_MOD = 288230376151711717
ROLLING_BASE = 31
ROLLING_INIT = 7


def rolling_hash(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", prefix_chars: int = 256
                 ) -> DataFrame:
    """Polynomial rolling-hash document fingerprint over the first
    `prefix_chars` characters: h = fold((acc*31 + codepoint) % M, init=7).

    Left fold via F.aggregate — fixed op order, exact int64 arithmetic,
    bit-identical in any engine (DuckDB oracle uses list_reduce).

    The prefix is cut with ``substring`` BEFORE the per-char split: a
    split-then-slice formulation materializes a per-char array of the FULL
    text per row and keeps 256 — same result at ~1/1000th the allocation
    on book-length documents (the oracle's ``substring(text, 1, 256)`` is
    the same cut)."""
    chars = F.split(F.substring(F.col(text_col), 1, prefix_chars), "")
    cps = F.transform(chars, lambda c: F.ascii(c).cast("bigint"))
    h = F.aggregate(
        cps, F.lit(ROLLING_INIT).cast("bigint"),
        lambda acc, c: (acc * ROLLING_BASE + c) % F.lit(ROLLING_MOD))
    return docs.select(F.col(id_col), h.alias("rhash"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", window: int = 5,
                hasher: str = "md5") -> DataFrame:
    """Winnowing-style document fingerprint (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — min-hash-of-shingles variant): the minimum hash over all
    `window`-word shingles — stable under content reordering at the margins
    and usable as a near-dup blocking key.

    hasher="md5" (default) is the engine-portable form with an exact DuckDB
    oracle twin; hasher="xxhash64" is the production fast path (~2x cheaper
    per shingle, Spark-only).  Either way the cost is dominated by shingle
    STRING CONSTRUCTION, not hashing — the scale lever is scan parallelism
    (at 100 TB the parquet scan has thousands of splits; a single-rowgroup
    local fixture must be repartitioned to see the same parallelism, see
    q20 in __spark_entry__)."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(window), F.lit(0)))
    sh = F.when(n < window, F.array(F.array_join(words, " "))).otherwise(
        F.transform(idx,
                    lambda i: F.array_join(F.slice(words, i + 1, window), " ")))
    if hasher == "md5":
        fp = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    elif hasher == "xxhash64":
        fp = F.array_min(F.transform(sh, lambda s: F.xxhash64(s)))
    else:
        raise ValueError(f"unknown hasher: {hasher!r}")
    return docs.select(F.col(id_col), fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# Repetition quality filters (the Gopher rules family — Rae et al.,
# "Scaling Language Models: Methods, Analysis & Insights from Training
# Gopher", 2021, §A1.1: fraction of characters/tokens in the most common
# n-gram, fraction of duplicate n-grams/lines).  Boilerplate-heavy and
# spam pages score high and get filtered before training.
#
# Scale shape: ZERO shuffle.  All three counts are per-document facts, so
# they are computed inside one projection with array functions — sort the
# gram array and take the longest equal-run for the top count (equal
# elements are adjacent after any sort, so the run length IS the
# frequency).  The explode→groupBy(doc, gram) formulation this replaces
# shuffled one row per (doc, gram) — tens of millions of rows at sf0.1
# and a full-corpus shuffle at 100 TB, for values that never leave their
# row.
# ---------------------------------------------------------------------------


def sorted_grams_col(text_col: str = "text", k: int = 2):
    """Sorted k-gram array — STAGE this in its own projection before the
    count folds reference it: Spark never common-subexpression-eliminates
    lambda-bearing expressions (SPARK-35410), so inlining it into several
    count columns recomputes the split+sort per reference."""
    from .dedup import shingles_col

    return F.array_sort(shingles_col(text_col, k))


def _top_run_col(grams):
    """Longest run of equal adjacent grams in an already-SORTED gram
    array column = max frequency.  Fold state: (previous gram, current
    run length, best run length)."""
    return F.aggregate(
        grams,
        F.struct(F.lit("").alias("prev"), F.lit(0).cast("bigint").alias("run"),
                 F.lit(0).cast("bigint").alias("best")),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("bigint"))).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def top_gram_frac_col(grams_col):
    """Most-frequent-k-gram share over a STAGED sorted-gram column."""
    return _top_run_col(grams_col) / F.size(grams_col).cast("double")


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 2) -> DataFrame:
    """Per-document n-gram repetition signals: total/most-frequent/distinct
    k-gram counts plus the two standard fractions (single IEEE division
    each, so the DuckDB oracle reproduces them bit-exactly).

    top_gram_frac  = count(most frequent k-gram) / count(all k-grams)
    dup_gram_frac  = (n_grams - distinct_grams) / n_grams

    Docs with no grams yield no row — mirroring `duplicate_line_stats`'s
    n_lines > 0 contract, so the fractions are never NULL downstream (the
    curation cascade thresholds on them).  The guard is expressed as the
    EQUIVALENT cheap predicate ``text IS NOT NULL`` applied BEFORE the
    gram projection: non-null text always yields ≥ 1 gram (a short text
    collapses to one joined shingle), and a post-projection
    ``n_grams > 0`` filter would be predicate-pushed through the staged
    select, re-evaluating the whole HOF gram chain per row (lambdas are
    never CSE'd, SPARK-35410 — measured 4x on the q49 bench).
    """
    staged = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), sorted_grams_col(text_col, k).alias("_g"))
    g = F.col("_g")
    return staged.select(
        F.col(id_col),
        F.size(g).cast("bigint").alias("n_grams"),
        _top_run_col(g).alias("top_gram_count"),
        F.size(F.array_distinct(g)).cast("bigint").alias("distinct_grams"),
    ).select(
        F.col(id_col), "n_grams", "top_gram_count", "distinct_grams",
        (F.col("top_gram_count") / F.col("n_grams").cast("double"))
        .alias("top_gram_frac"),
        ((F.col("n_grams") - F.col("distinct_grams"))
         / F.col("n_grams").cast("double")).alias("dup_gram_frac"),
    )


def duplicate_line_stats(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Line-level Gopher duplicates for newline-structured texts: fraction
    of lines that are repeats of an earlier-seen line, and the fraction of
    CHARACTERS those repeats carry (boilerplate footers repeat verbatim).

    Row-local like `repetition_stats`: duplicate occurrences are the
    equal-adjacent runs of the SORTED line array — zero shuffle (the
    values never leave their row).  Docs with no non-blank lines yield no
    row, matching the previous groupBy formulation; the guard is the
    EQUIVALENT cheap pre-filter ``text rlike '[^ \\n]'`` (a line is
    non-blank iff it has a char that is neither space nor newline) —
    a post-projection ``n_lines > 0`` filter would be predicate-pushed
    through the staged select and re-evaluate the whole split/sort chain
    per row (lambdas are never CSE'd, SPARK-35410).  The line array and
    the dup fold are STAGED in their own projections for the same
    reason."""
    staged = docs.filter(F.col(text_col).rlike("[^ \n]")).select(
        F.col(id_col),
        F.array_sort(
            F.filter(F.split(F.col(text_col), r"\n"),
                     lambda ln: F.trim(ln) != "")).alias("_lines"))
    lines = F.col("_lines")
    # fold state: (prev line, duplicate-occurrence count, duplicate chars)
    dup = F.aggregate(
        lines,
        F.struct(F.lit(None).cast("string").alias("prev"),
                 F.lit(0).cast("bigint").alias("dl"),
                 F.lit(0).cast("bigint").alias("dc")),
        lambda acc, ln: F.struct(
            ln.alias("prev"),
            F.when(ln == acc["prev"], acc["dl"] + 1)
            .otherwise(acc["dl"]).alias("dl"),
            F.when(ln == acc["prev"], acc["dc"] + F.length(ln))
            .otherwise(acc["dc"]).alias("dc"),
        ),
    )
    n_chars = F.aggregate(lines, F.lit(0).cast("bigint"),
                          lambda acc, ln: acc + F.length(ln))
    folded = staged.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        dup.alias("_d"),
        n_chars.alias("n_chars_all"),
    )
    return folded.select(
        F.col(id_col),
        F.col("n_lines"),
        F.col("_d")["dl"].alias("dup_lines"),
        F.col("n_chars_all"),
        F.col("_d")["dc"].alias("dup_chars"),
    ).select(
        F.col(id_col), "n_lines", "dup_lines",
        (F.col("dup_lines") / F.col("n_lines").cast("double"))
        .alias("dup_line_frac"),
        (F.col("dup_chars") / F.col("n_chars_all").cast("double"))
        .alias("dup_line_char_frac"),
    )


# ---------------------------------------------------------------------------
# Hashed bag-of-words linear classifier scoring — the INFERENCE step of the
# quality classifiers every large pretraining corpus pass runs (the
# GPT-3-style logistic-regression quality filter, Brown et al. 2020
# appendix A; the fastText-based DCLM/FineWeb-Edu filters): features are
# words hashed into D buckets, the model is a weight per bucket plus a
# bias, the verdict is a logit threshold.  Scoring a frozen model is pure
# arithmetic — one fused projection, zero shuffle, zero Python — so a
# 100 TB corpus scores at scan speed.
#
# Exactness discipline: weights are INTEGER TENTHS (the model is frozen
# at 0.1 resolution) and the logit is an exact BIGINT fold, so the oracle
# compares integers — no float summation order, no libm sigmoid drift
# (sigmoid is monotone: thresholding the logit IS thresholding the
# probability; callers that want the probability apply it downstream).
# ---------------------------------------------------------------------------


def hashed_bow_logit(docs: DataFrame, weights_tenths, bias_tenths: int = 0,
                     id_col: str = "doc_id", text_col: str = "text",
                     threshold_tenths: int = 0) -> DataFrame:
    """(id, logit_tenths, keep): logit_tenths = bias + Σ over words of
    weights[md5hash60(word) % D] (all integer tenths, exact BIGINT math);
    keep = logit_tenths > threshold_tenths.

    The weight vector is embedded as a Catalyst literal array (a frozen
    model of a few thousand buckets broadcasts inside the expression —
    no dimension-table join).  Word hashing reuses the engine-portable
    md5-15-hex trick (`sketches._hash60` semantics on the word string),
    so the exact same bucket assignment is reproducible in ANSI SQL."""
    from .sketches import _hash60  # the ONE engine-portable hash

    D = len(weights_tenths)
    if D == 0:
        # pmod-by-zero would surface as an opaque executor error deep in
        # the job; fail at the caller with intent, like the capacity /
        # chunk_tokens guards elsewhere
        raise ValueError("hashed_bow_logit needs a non-empty weight "
                         "vector (bucket count = len(weights_tenths))")
    w_lit = F.array(*[F.lit(int(v)).cast("bigint") for v in weights_tenths])
    # stage the word array in its own projection (SPARK-35410: HOF
    # expressions are never CSE'd); NULL text coalesces to "" so a
    # NULL-text doc scores the bare bias with a REAL keep verdict
    # (split(NULL) would otherwise propagate NULL logit/keep, silently
    # vanishing from any filter(keep) and diverging from the oracle's
    # COALESCE)
    staged = docs.select(
        F.col(id_col),
        F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                 lambda w: w != "").alias("_ws"),
        w_lit.alias("_w"))
    bucket = lambda w: F.pmod(_hash60(w), F.lit(D))  # noqa: E731
    logit = (F.lit(int(bias_tenths)).cast("bigint")
             + F.aggregate(
                 F.transform(F.col("_ws"),
                             lambda w: F.element_at(F.col("_w"),
                                                    (bucket(w) + 1)
                                                    .cast("int"))),
                 F.lit(0).cast("bigint"), lambda acc, v: acc + v))
    return staged.select(
        F.col(id_col),
        logit.alias("logit_tenths"),
    ).withColumn("keep", F.col("logit_tenths")
                 > F.lit(int(threshold_tenths)).cast("bigint"))


def top_k_words(docs: DataFrame, k: int = 100,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(word, count, doc_freq): the corpus's k most frequent whitespace
    words with total occurrence count and document frequency — the
    vocabulary profile tokenizer training (BPE corpus prep), stopword
    derivation, and corpus QA start from.

    Scale shape: explode → one groupBy(word) computing BOTH aggregates
    in a single shuffle (the doc-frequency side pre-dedups (word, doc)
    pairs map-side via the partial distinct aggregate), then top-k as
    sort+limit — Spark plans TakeOrdered, keeping k rows per partition
    instead of a full corpus-vocabulary sort.  Ties order by word, so
    the cut is deterministic.  Counts are exact BIGINTs — no sketch, no
    float."""
    if k <= 0:
        raise ValueError(f"k must be positive: got {k}")
    words = docs.select(
        F.col(id_col),
        F.explode(F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda w: w != "")).alias("word"))
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("count"),
        F.countDistinct(F.col(id_col)).alias("doc_freq"))
    return counts.orderBy(F.col("count").desc(), F.col("word")).limit(k)
