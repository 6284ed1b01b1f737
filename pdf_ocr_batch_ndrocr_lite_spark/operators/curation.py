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
    """Full HOST extraction (no suffix logic — use
    :func:`registrable_domain` for PSL-aware eTLD+1 grouping)."""
    return F.lower(F.regexp_extract(url_col, r"^[a-zA-Z]+://([^/:]+)", 1))


# Frozen public-suffix subset (publicsuffix.org data, the high-traffic
# entries a crawl actually hits), embedded as literals — no dependency,
# broadcast inside the expression.  ALL THREE PSL rule classes are
# implemented (normal, wildcard `*.`, exception `!`), with the real
# algorithm's precedence (exception beats everything, else most labels
# wins, else the implicit `*` TLD rule) — swapping in the full published
# dat file is a data change only, the expression shape is complete.
PUBLIC_SUFFIXES_2L = [
    # ccTLD second-level registries
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "ac.in", "gov.in", "res.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.th", "ac.th", "go.th", "or.th", "in.th",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua",
    "co.il", "net.il", "org.il", "ac.il", "gov.il",
    "com.eg", "com.sa", "com.pk", "com.bd", "com.vn", "com.ph",
    "com.ng", "com.co", "com.pe", "com.ve", "com.uy", "com.ec",
    "co.id", "or.id", "ac.id", "go.id", "web.id",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "co.at", "or.at", "ac.at", "gv.at",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    # shared-hosting / platform suffixes (one registrant per label below)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "appspot.com", "netlify.app", "vercel.app",
    "pages.dev", "web.app", "firebaseapp.com", "azurewebsites.net",
    "cloudfront.net", "amazonaws.com", "readthedocs.io", "neocities.org",
    "tumblr.com", "fastly.net",
]

# Normal 3-label suffixes (publicsuffix.org): US K-12 state registries,
# Australian state education registries, the S3 bucket-website suffix.
PUBLIC_SUFFIXES_3L = [
    "k12.ca.us", "k12.ma.us", "k12.ny.us", "k12.tx.us", "k12.wa.us",
    "act.edu.au", "nsw.edu.au", "qld.edu.au", "vic.edu.au",
    "s3.amazonaws.com", "s3-website-us-east-1.amazonaws.com",
]

# Wildcard rules `*.<base>` (publicsuffix.org): every DIRECT child of the
# base is itself a public suffix.  Japanese city registries, legacy
# wildcard ccTLDs, and the EC2 per-region hostname space.
PSL_WILDCARD_BASES_1L = ["ck", "bd", "er", "fk", "mm", "np"]
PSL_WILDCARD_BASES_2L = [
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
]
PSL_WILDCARD_BASES_3L = ["compute.amazonaws.com", "elb.amazonaws.com"]

# Exception rules `!<host>` (publicsuffix.org): carve-outs from a
# wildcard — the named host IS registrable even though the wildcard
# would make it a public suffix.
PSL_EXCEPTIONS_2L = ["www.ck"]
PSL_EXCEPTIONS_3L = [
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
]


def _last_labels(parts, k):
    """Dotted join of the last k labels.  try_element_at: under ANSI
    mode an out-of-bounds element_at raises, and non-short-circuiting
    `&` evaluates every branch's expression — shorter hosts instead
    yield NULLs that concat_ws skips (degenerate value = the full host),
    and every isin test below is guarded by an n >= k predicate, so the
    degenerate value can never match a k-label rule set."""
    return F.concat_ws(
        ".", *[F.try_element_at(parts, F.lit(-i)) for i in range(k, 0, -1)])


def registrable_domain(url_col):
    """PSL-aware eTLD+1: the registrable domain of the url's host, with
    the full publicsuffix.org ALGORITHM (not just 2-label lookup):

    - exception rules win outright: ``sub.city.kawasaki.jp`` →
      ``city.kawasaki.jp`` (the ``!city.kawasaki.jp`` carve-out from
      ``*.kawasaki.jp``), ``anything.www.ck`` → ``www.ck``;
    - else the matching rule with the MOST labels wins, a wildcard
      ``*.base`` consuming one real label: under ``*.kawasaki.jp`` the
      public suffix of ``x.a.kawasaki.jp`` is ``a.kawasaki.jp``, so the
      registrable domain is the whole ``x.a.kawasaki.jp``; EC2 hosts
      ``name.us-east-1.compute.amazonaws.com`` likewise stay whole
      under ``*.compute.amazonaws.com``;
    - else normal rules (``co.jp`` → last 3, ``s3.amazonaws.com`` →
      last 4);
    - else the implicit ``*`` rule: the TLD is the suffix (last 2
      labels are registrable).

    A host that IS a public suffix (or shorter) passes through
    unchanged — it has no registrable domain, and passthrough keeps the
    cap keys total.  ``a.co.jp`` and ``b.co.jp`` are DIFFERENT
    registrants — grouping by bare host under-caps them, last-2-labels
    grouping merges every ``co.jp`` registrant into one mega-key.  Pure
    Catalyst (split + element_at + isin over frozen literal lists)."""
    host = extract_domain(url_col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last1 = F.element_at(parts, -1)
    last2 = _last_labels(parts, 2)
    last3 = _last_labels(parts, 3)
    last4 = _last_labels(parts, 4)
    last5 = _last_labels(parts, 5)
    ps_n = (
        # exception rules first (PSL: exceptions beat every other match)
        F.when((n >= 3) & last3.isin(PSL_EXCEPTIONS_3L), F.lit(2))
        .when((n >= 2) & last2.isin(PSL_EXCEPTIONS_2L), F.lit(1))
        # then longest match, wildcards consuming one real label
        .when((n >= 4) & last3.isin(PSL_WILDCARD_BASES_3L), F.lit(4))
        .when((n >= 3) & (last3.isin(PUBLIC_SUFFIXES_3L)
                          | last2.isin(PSL_WILDCARD_BASES_2L)), F.lit(3))
        .when((n >= 2) & (last2.isin(PUBLIC_SUFFIXES_2L)
                          | last1.isin(PSL_WILDCARD_BASES_1L)), F.lit(2))
        .otherwise(F.lit(1))
    )
    return (F.when(n <= ps_n, host)
            .when(ps_n == 4, last5)
            .when(ps_n == 3, last4)
            .when(ps_n == 2, last3)
            .otherwise(last2))


def per_domain_cap(docs: DataFrame, url_col: str = "url", cap: int = 3,
                   order_col: str = "url", psl: bool = False) -> DataFrame:
    """Keep at most `cap` documents per domain (deterministic order).

    ``psl=True`` caps per REGISTRABLE domain (PSL-aware eTLD+1) instead
    of per host — the source-diversity semantics a crawl curation pass
    wants (one spam registrant cannot dodge the cap with wildcard
    subdomains).

    Window row_number per domain — one shuffle on the domain key; skewed
    mega-domains are exactly what the cap removes, so the shuffle's own skew
    is self-limiting (only `cap` rows per key survive the window; AQE handles
    the sort-side skew)."""
    domain = (registrable_domain(F.col(url_col)) if psl
              else extract_domain(F.col(url_col)))
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
                     k: int = 2,
                     require_lang: bool = True) -> DataFrame:
    """(id, keep, reason) per document.  Reason priority mirrors pipeline
    order: 'exact_dup' (not the first-seen copy of its text digest) >
    'lang' (language ID failed) > 'quality' (composite score below
    threshold) > 'repetition' (most-frequent k-gram share above
    threshold) > 'kept'.

    ``require_lang=False`` disables the lang kill (corpora curated
    without language filtering — e.g. code or multilingual crawls the
    marker-word heuristic cannot cover); the other gates are unchanged."""
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
    lang_fails = (F.col("lang_pred") == "unknown") if require_lang \
        else F.lit(False)
    reason = (
        F.when(F.col("_rn") > 1, F.lit("exact_dup"))
        .when(lang_fails, F.lit("lang"))
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


def quality_percentile_cut(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           stratum_col: str = "lang",
                           q: float = 0.1) -> DataFrame:
    """Per-stratum dynamic quality thresholding (the CCNet move: calibrate
    the cut per language instead of one global constant — a fixed 0.45
    that is right for English over-kills a stratum whose scores run low).
    Keeps documents whose composite quality is >= the stratum's q-th
    percentile (percentile_disc over (quality, id) order, so ties at the
    cut survive).  Returns (id, stratum, quality).

    Plan: one fused scoring projection, one exchange for the per-stratum
    quantile, then a BROADCAST join of the cut table (one row per
    stratum) back onto the scored frame — the corpus is never shuffled a
    second time."""
    from . import textstats as ts
    from . import quantiles as qt

    scored = docs.select(F.col(id_col), F.col(stratum_col),
                         ts.quality_col(text_col).alias("quality"))
    cut = (qt.exact_quantiles(scored, stratum_col, "quality", [q], id_col)
           .select(F.col(stratum_col), F.col("value").alias("_cut")))
    return (scored.join(F.broadcast(cut), stratum_col)
            .filter(F.col("quality") >= F.col("_cut"))
            .select(id_col, stratum_col, "quality"))
