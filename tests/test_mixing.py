"""Training-data assembly operators: decontamination, packing, mixing —
hand-computed semantics plus the plan shapes that make them 100 TB-safe
(broadcast benchmark side, partitioned packing window, shuffle-free
sampling)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.operators import mixing as mx


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, lang string, text string")


# --- decontamination -------------------------------------------------------


def test_contamination_hits_counts_distinct_shared_shingles(spark):
    docs = _docs(spark, [
        (0, "en", "alpha beta gamma delta"),          # benchmark member
        (1, "en", "alpha beta gamma epsilon"),        # 2 shared shingles
        (2, "en", "alpha beta something else here"),  # only 1 shared
        (3, "en", "totally unrelated text content"),  # 0 shared
        # shingle repeated IN-doc counts once (distinct semantics)
        (4, "en", "alpha beta gamma alpha beta gamma"),
    ])
    bench = docs.filter(F.col("doc_id") == 0)
    got = {r["doc_id"]: r["matched_shingles"]
           for r in mx.contamination_hits(docs, bench, k=3,
                                          min_overlap=2).collect()}
    # doc 0 matches itself fully (3 shingles), doc 1 shares
    # "alpha beta gamma"+"beta gamma epsilon"? no — only 2 of its
    # shingles exist in bench: "alpha beta gamma" and "beta gamma
    # epsilon" is NOT in bench → shares exactly 1... verify by set math:
    # bench shingles: {abg, bgd} (k=3 over 4 words → 2 shingles)
    # doc1: {abg, bge} → 1 hit → filtered by min_overlap=2
    # doc4: {abg, bga, gab, abg…} distinct → abg present → 1 hit
    assert got == {0: 2}


def test_benchmark_decontaminate_drops_only_contaminated(spark):
    docs = _docs(spark, [
        (0, "en", "the quick brown fox jumps over"),
        (1, "en", "the quick brown fox leaps over"),   # 2 shared shingles
        (2, "en", "completely different words entirely now"),
    ])
    bench = docs.filter(F.col("doc_id") == 0)
    kept = sorted(r["doc_id"] for r in
                  mx.benchmark_decontaminate(docs, bench, k=3,
                                             min_overlap=2).collect())
    assert kept == [2]  # 0 matches itself, 1 shares {tqb, qbf} → dropped


def test_contamination_plan_broadcasts_benchmark_side(spark):
    docs = _docs(spark, [(i, "en", f"text number {i} here") for i in range(8)])
    bench = docs.filter(F.col("doc_id") == 0)
    plan = mx.contamination_hits(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# --- sequence packing ------------------------------------------------------


def test_pack_sequences_concat_and_chunk(spark):
    docs = _docs(spark, [
        (0, "en", " ".join(["w"] * 300)),   # en stream: 0..299
        (1, "en", " ".join(["w"] * 300)),   # 300..599 → starts bin 0 @300
        (2, "en", " ".join(["w"] * 300)),   # 600..899 → bin 1 @88
        (3, "de", " ".join(["w"] * 600)),   # de stream independent
        (4, "de", " ".join(["w"] * 10)),    # starts at 600 → bin 1 @88
    ])
    got = {r["doc_id"]: (r["shard"], r["n_tokens"], r["bin_id"],
                         r["bin_offset"])
           for r in mx.pack_sequences(docs, capacity=512).collect()}
    assert got[0] == ("en", 300, 0, 0)
    assert got[1] == ("en", 300, 0, 300)
    assert got[2] == ("en", 300, 1, 88)    # 600 % 512
    assert got[3] == ("de", 600, 0, 0)
    assert got[4] == ("de", 10, 1, 88)


def test_pack_sequences_window_is_partitioned(spark):
    """The packing window must be partitioned by the shard key — a global
    (unpartitioned) running sum would serialize the whole corpus through
    one task at scale."""
    docs = _docs(spark, [(i, "en" if i % 2 else "de", "a b c")
                         for i in range(6)])
    plan = mx.pack_sequences(docs, capacity=512)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "windowspecdefinition(shard" in plan.replace(" ", "") \
        or "partitionBy" in plan or "hashpartitioning(shard" in \
        plan.replace(" ", "")


# --- stratified sampling ---------------------------------------------------


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15],
               16) % 10_000


def test_stratified_sample_exact_member_set(spark):
    docs = _docs(spark, [(i, ["en", "zh", "fr"][i % 3], "t")
                         for i in range(300)])
    rates = {"en": 0.5, "zh": 0.2}
    kept = sorted(r["doc_id"] for r in
                  mx.stratified_sample(docs, rates, default_rate=0.1)
                  .collect())
    want = sorted(
        i for i in range(300)
        if _bucket(i) < {"en": 5000, "zh": 2000}.get(
            ["en", "zh", "fr"][i % 3], 1000))
    assert kept == want
    assert len(kept) > 0


def test_stratified_sample_zero_default_drops_unknown_strata(spark):
    docs = _docs(spark, [(i, "xx", "t") for i in range(50)])
    assert mx.stratified_sample(docs, {"en": 1.0}).count() == 0


def test_stratified_sample_is_shuffle_free(spark):
    docs = _docs(spark, [(i, "en", "t") for i in range(10)])
    plan = mx.stratified_sample(docs, {"en": 0.5})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side filter


def test_stratified_exact_k_counts_and_members(spark):
    """Exactly min(k, |stratum|) rows per stratum, and the member set
    equals the naive full-sort formulation (two-phase min-k is lossless:
    any global top-k element is top-k within its salt cell)."""
    from pyspark.sql import Window

    rows = [(i, "big") for i in range(200)] + [(1000 + i, "small")
                                               for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id int, lang string")
    got = mx.stratified_exact_k(docs, k=10, salt_partitions=8)
    by = {}
    for r in got.collect():
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by["big"]) == 10 and len(by["small"]) == 4
    from pdf_ocr_batch_ndrocr_lite_spark.operators.sketches import _hash60
    w = Window.partitionBy("lang").orderBy(_hash60(F.col("doc_id")),
                                           "doc_id")
    naive = docs.withColumn("_rn", F.row_number().over(w)) \
        .filter(F.col("_rn") <= 10)
    want = {}
    for r in naive.collect():
        want.setdefault(r["lang"], set()).add(r["doc_id"])
    assert by == want


def test_stratified_exact_k_plan_is_two_phase_no_window(spark):
    """The sampler must be the bounded-state aggregation shape: salted
    partial + merge, no stratum-wide Window sort."""
    docs = spark.createDataFrame([(i, "g") for i in range(50)],
                                 "doc_id int, lang string")
    plan = mx.stratified_exact_k(docs, k=5)._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "Window" not in plan
    assert "pmod" in plan
    assert plan.count("Aggregate") >= 2
