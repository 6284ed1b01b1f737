"""Scale-guard behavior tests: the operators whose round-1 formulations
would not survive 100 TB (kmv collect_set, jaccard stop-shingles) now have
bounded shapes — these tests pin both the semantics and the bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.operators import dedup as dd
from pdf_ocr_batch_ndrocr_lite_spark.operators import sketches as sk


# ---------------------------------------------------------------------------
# kmv_distinct: two-phase min-k must equal the naive one-phase form and keep
# per-cell aggregation state bounded.
# ---------------------------------------------------------------------------


def _naive_kmv(spark_df, group_col, value_col, k):
    hashed = spark_df.select(
        group_col, sk._hash60(F.col(value_col)).alias("_h"))
    per_group = hashed.groupBy(group_col).agg(
        F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("_mins"))
    n = F.size("_mins")
    kth = F.element_at("_mins", k).cast("double")
    est = F.when(n < k, n.cast("bigint")).otherwise(
        F.floor(F.lit(float(k - 1)) / (kth / F.lit(sk._HASH_SPACE)))
        .cast("bigint"))
    return per_group.select(group_col, est.alias("kmv_estimate"),
                            n.alias("sketch_size"))


def test_kmv_two_phase_equals_one_phase(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("g"),
        # ~50% duplicate values so distinct-per-group spans both sides of k
        (F.col("id") % 2500).cast("string").alias("v"))
    got = {tuple(r[:1]): (r["kmv_estimate"], r["sketch_size"])
           for r in sk.kmv_distinct(df, ["g"], "v", k=32,
                                    salt_partitions=8).collect()}
    want = {tuple(r[:1]): (r["kmv_estimate"], r["sketch_size"])
            for r in _naive_kmv(df, "g", "v", 32).collect()}
    assert got == want


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 40).select(
        F.lit("only").alias("g"), F.col("id").cast("string").alias("v"))
    rows = sk.kmv_distinct(df, ["g"], "v", k=64).collect()
    assert len(rows) == 1
    assert rows[0]["kmv_estimate"] == 40  # exact when distinct < k
    assert rows[0]["sketch_size"] == 40


def test_kmv_plan_has_salted_partial_phase(spark):
    """The first aggregation must group by (group, salt): no single
    aggregation state ever sees a whole group's distinct hash set."""
    df = spark.range(0, 100).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    plan = sk.kmv_distinct(df, ["g"], "v", k=8, salt_partitions=4) \
        ._jdf.queryExecution().optimizedPlan().toString()
    # the optimizer folds the `_salt` alias into a _groupingexpression but
    # the pmod-keyed partial aggregate must survive
    assert "pmod" in plan
    # two logical aggregate levels: the salted partial and the merge
    assert plan.count("Aggregate") >= 2


# ---------------------------------------------------------------------------
# ngram_jaccard_pairs max_df: a ubiquitous stop-shingle must not create a
# quadratic self-join intermediate, and jaccard must be computed over the
# filtered shingle sets.
# ---------------------------------------------------------------------------


def _stop_shingle_corpus(spark, n=40):
    """Every doc contains the stop bigram 'of the'; docs i and i+1 (even i)
    additionally share a unique bigram, so true near-dup pairs exist."""
    rows = []
    for i in range(n):
        pair_tag = f"tag{i // 2} x{i // 2}"
        rows.append((i, f"of the {pair_tag} uniq{i} z{i}"))
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_jaccard_max_df_drops_stop_shingles(spark):
    docs = _stop_shingle_corpus(spark)
    pairs = dd.ngram_jaccard_pairs(docs, k=2, threshold=0.2, max_df=4) \
        .collect()
    got = {(r["a_id"], r["b_id"]) for r in pairs}
    # only the engineered (even, even+1) pairs survive; the stop shingle
    # no longer links every doc to every other doc
    assert got == {(i, i + 1) for i in range(0, 40, 2)}


def test_jaccard_stop_shingle_intermediate_bounded(spark):
    """Row-count proof the guard kills the quadratic blow-up: with the
    ubiquitous shingle kept, the self-join emits ~n^2/2 rows; with max_df
    it emits only the engineered pairs."""
    docs = _stop_shingle_corpus(spark)
    unfiltered = dd.ngram_jaccard_pairs(docs, k=2, threshold=0.0).count()
    filtered = dd.ngram_jaccard_pairs(docs, k=2, threshold=0.0,
                                      max_df=4).count()
    assert unfiltered == 40 * 39 // 2  # every pair shares 'of the'
    assert filtered == 20


def test_minhash_dedup_accepts_max_df(spark):
    """Pairs (i, i+1) have identical text, so their minhash signatures are
    identical and candidacy is guaranteed (no LSH luck involved); unrelated
    docs share ONLY the stop shingle, so any accidental bucket collision
    must be rejected by the DF-filtered verify stage."""
    rows = []
    for i in range(40):
        rows.append((i, f"of the alpha{i // 2} beta{i // 2} gamma{i // 2}"))
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    kept = dd.minhash_dedup(docs, num_hashes=4, bands=2, k=2,
                            jaccard_threshold=0.3, max_df=4)
    ids = {r["doc_id"] for r in kept.collect()}
    # each identical pair loses its higher id; all even ids survive
    assert ids == set(range(0, 40, 2))


# ---------------------------------------------------------------------------
# exact_quantiles: percentile_disc semantics, deterministic under ties.
# ---------------------------------------------------------------------------


def test_exact_quantiles_matches_sorted_ranks(spark):
    from pdf_ocr_batch_ndrocr_lite_spark.operators import quantiles as qt
    rows = [("a", v, i) for i, v in enumerate([5, 1, 9, 3, 7, 3, 3])] \
        + [("b", v, 100 + i) for i, v in enumerate([10, 20])]
    df = spark.createDataFrame(rows, "g string, v int, id int")
    got = {(r["g"], r["q"]): r["value"]
           for r in qt.exact_quantiles(df, "g", "v", [0.5, 0.9, 1.0],
                                       tiebreak_col="id").collect()}
    # group a sorted: [1,3,3,3,5,7,9], n=7 → p50=rank ceil(3.5)=4 → 3;
    # p90=rank ceil(6.3)=7 → 9; p100=rank 7 → 9
    assert got[("a", 0.5)] == 3
    assert got[("a", 0.9)] == 9
    assert got[("a", 1.0)] == 9
    # group b: [10,20] → p50=rank 1 → 10, p90/p100=rank 2 → 20
    assert got[("b", 0.5)] == 10
    assert got[("b", 1.0)] == 20


def test_exact_quantiles_single_row_and_low_q(spark):
    from pdf_ocr_batch_ndrocr_lite_spark.operators import quantiles as qt
    df = spark.createDataFrame([("g", 42, 0)], "g string, v int, id int")
    got = {r["q"]: r["value"]
           for r in qt.exact_quantiles(df, "g", "v", [0.01, 0.99],
                                       tiebreak_col="id").collect()}
    # rank max(1, ceil(q*1)) = 1 for every q
    assert got == {0.01: 42, 0.99: 42}


# ---------------------------------------------------------------------------
# page_geometry: reference render-side math (app.py:1381-1443, 3911-3918).
# ---------------------------------------------------------------------------


def test_geometry_reference_semantics(spark):
    from pdf_ocr_batch_ndrocr_lite_spark.operators import geometry as geo
    rows = [
        # (id, render_dpi, width_px, rotation, media_w, crop_w, img_dpi)
        (0, 50, 720, -90, 0.0, 0.0, 19.9),      # dpi clamps to 72; rot 270
        (1, 200, 800, 450, None, 400.0, 20.0),  # rot 90; media -> width_pt
        (2, 300, 600, 0, 595.2, 0.0, 1200.0),   # crop -> media
        (3, 72, 144, 359, 100.0, 50.0, 1200.1),  # img dpi > 1200 -> 150
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, render_dpi int, width_px int, rotation_deg int, "
              "media_width_pt double, crop_width_pt double, img double") \
        .withColumn("height_px", F.col("width_px"))
    out = {r["doc_id"]: r for r in geo.page_geometry(df).withColumn(
        "img_norm", geo.normalize_dpi(F.col("img"))).collect()}
    assert out[0]["norm_dpi"] == 72 and out[0]["width_pt"] == 720.0
    assert out[0]["rotation_norm"] == 270          # Python % semantics
    assert out[0]["media_width_pt_norm"] == 720.0  # 0.0 -> width_pt
    assert out[0]["crop_width_pt_norm"] == 720.0   # 0.0 -> media fallback
    assert out[0]["img_norm"] == 150.0             # below accepted range
    assert out[1]["rotation_norm"] == 90
    assert out[1]["media_width_pt_norm"] == out[1]["width_pt"]  # NULL
    assert out[1]["crop_width_pt_norm"] == 400.0
    assert out[1]["img_norm"] == 20.0              # boundary accepted
    assert out[2]["crop_width_pt_norm"] == 595.2   # crop 0 -> media value
    assert out[2]["img_norm"] == 1200.0            # boundary accepted
    assert out[3]["img_norm"] == 150.0             # above accepted range


# ---------------------------------------------------------------------------
# simhash: all 60 bit votes in one projection — no bit-position explode
# multiplying the groupBy input by 60.
# ---------------------------------------------------------------------------


def test_simhash_rejects_bits_over_60():
    import pytest
    with pytest.raises(ValueError, match=r"\[1, 60\]"):
        dd.simhash(None, bits=61)
    with pytest.raises(ValueError):
        dd.simhash(None, bits=0)


def test_simhash_plan_has_no_bit_explode(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma")],
                               "doc_id int, text string")
    plan = dd.simhash(df)._jdf.queryExecution().optimizedPlan().toString()
    # exactly ONE Generate (the word explode); a bit-position explode
    # would add a second and multiply shuffle input rows by 60
    assert plan.count("Generate") == 1
    assert plan.count("Aggregate") == 1  # one groupBy(doc), no per-bit agg


def test_simhash_matches_python_majority_vote(spark):
    import hashlib
    docs = [(1, "the quick brown fox the"),   # duplicate word: weighted vote
            (2, "lorem ipsum dolor sit amet"),
            (3, "single")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: r["simhash"] for r in dd.simhash(df).collect()}
    for did, text in docs:
        words = [w for w in text.split() if w]
        fp = 0
        for b in range(60):
            v = 0
            for w in words:
                wh = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
                v += 1 if (wh >> b) & 1 else -1
            if v > 0:
                fp |= 1 << b
        assert got[did] == fp, did


# ---------------------------------------------------------------------------
# embedding_near_dup_pairs: hot-bucket salt split — one skewed bucket must
# not become a single O(n^2) task, and results must be cap-invariant.
# ---------------------------------------------------------------------------


def _skewed_embeddings(spark, hot_n=40, cold_n=4):
    """One hot bucket with 10x the rows of each cold bucket; vectors i and
    i+1 (even i, hot bucket) are identical → guaranteed near-dup pairs."""
    rows = []
    for i in range(hot_n):
        base = i // 2  # pairs share a vector
        vec = [float((base * 7 + j * 3) % 11 + 1) for j in range(8)]
        rows.append((i, "hot", vec))
    for i in range(cold_n):
        vec = [float((i * 13 + j) % 9 + 1) for j in range(8)]
        rows.append((100 + i, "cold", vec))
    return spark.createDataFrame(
        rows, "vec_id int, label string, embedding array<double>")


def test_embedding_near_dup_cap_invariant(spark):
    emb = _skewed_embeddings(spark)
    def key(rows):
        return {(r["a_id"], r["b_id"], r["cosine"]) for r in rows}
    plain = key(dd.embedding_near_dup_pairs(
        emb, threshold=0.999999, bucket_cap=10**9).collect())
    split = key(dd.embedding_near_dup_pairs(
        emb, threshold=0.999999, bucket_cap=8).collect())
    # the engineered identical-vector pairs are found (other modular
    # collisions in the synthetic vectors may also qualify — fine)
    assert {(i, i + 1) for i in range(0, 40, 2)} <= \
        {(a, b) for a, b, _ in plain}
    # each pair appears exactly once (the replicated a-side must not
    # double-count), and the salt split changes nothing
    assert len(plain) == len({(a, b) for a, b, _ in plain})
    assert split == plain


def test_embedding_near_dup_blas_kernel_tolerance_verified(spark):
    """kernel='blas' (Arrow/numpy einsum per candidate pair) vs the exact
    left fold: identical pair SET (these double-precision vectors leave
    margins that dwarf reduction-order noise), cosines within 1e-12, and
    the default kernel stays 'exact' (the q29 oracle's bit-identical
    path).  The join shape — bucketed + salt-split — is shared, so the
    blas path inherits every hot-bucket guarantee."""
    emb = _skewed_embeddings(spark)
    exact = {(r["a_id"], r["b_id"]): r["cosine"]
             for r in dd.embedding_near_dup_pairs(
                 emb, threshold=0.999999).collect()}
    blas = {(r["a_id"], r["b_id"]): r["cosine"]
            for r in dd.embedding_near_dup_pairs(
                emb, threshold=0.999999, kernel="blas").collect()}
    assert set(exact) == set(blas)
    for k, v in exact.items():
        assert abs(v - blas[k]) < 1e-12
    # and under the salt split too (cap forces s > 1 on the hot bucket)
    blas_split = {(r["a_id"], r["b_id"]) for r in dd.embedding_near_dup_pairs(
        emb, threshold=0.999999, bucket_cap=8, kernel="blas").collect()}
    assert blas_split == set(exact)


def test_embedding_near_dup_zero_norm_vector_excluded_not_fatal(spark):
    """A zero-norm embedding (dead row, zeroed-out record) has undefined
    cosine: both kernels must EXCLUDE its pairs — the exact kernel would
    otherwise abort the whole job with an ANSI DIVIDE_BY_ZERO, and a
    NaN from the blas kernel would PASS a >= threshold filter (Spark
    orders NaN above every number).  Verified regression."""
    emb = spark.createDataFrame(
        [(0, "b", [1.0, 2.0, 3.0]),
         (1, "b", [1.0, 2.0, 3.0]),      # exact dup of 0 → pair survives
         (2, "b", [0.0, 0.0, 0.0])],     # zero norm → no pairs, no crash
        "vec_id int, label string, embedding array<double>")
    for kern in ("exact", "blas"):
        pairs = {(r["a_id"], r["b_id"])
                 for r in dd.embedding_near_dup_pairs(
                     emb, threshold=0.9, kernel=kern).collect()}
        assert pairs == {(0, 1)}, kern


def test_embedding_near_dup_blas_null_and_ragged_rows_degrade(spark):
    """kernel='blas' must share the exact kernel's failure semantics on
    NULL / wrong-length embeddings: the row's pairs degrade to NULL
    cosine (dropped by the threshold filter), never an np.stack abort
    inside the executor."""
    emb = spark.createDataFrame(
        [(0, "b", [1.0, 2.0, 3.0]),
         (1, "b", [1.0, 2.0, 3.0]),      # exact dup of 0 → pair survives
         (2, "b", None),                  # NULL embedding
         (3, "b", [1.0, 2.0])],          # ragged (wrong dim)
        "vec_id int, label string, embedding array<double>")
    for kern in ("exact", "blas"):
        pairs = {(r["a_id"], r["b_id"])
                 for r in dd.embedding_near_dup_pairs(
                     emb, threshold=0.9, kernel=kern).collect()}
        assert pairs == {(0, 1)}, kern


def test_embedding_near_dup_rejects_unknown_kernel(spark):
    import pytest
    emb = spark.createDataFrame([(0, "b", [1.0])],
                                "vec_id int, label string, "
                                "embedding array<double>")
    with pytest.raises(ValueError, match="kernel"):
        dd.embedding_near_dup_pairs(emb, kernel="BLAS")


def test_embedding_hot_bucket_split_bounds_cell_size(spark):
    """With cap=8 the 40-row hot bucket splits into s=5 cells: the largest
    single join cell sees 40 (replicated a-side) x ~8 (b-side) candidates
    instead of 40 x 40 — the straggler task shrinks ~s-fold."""
    from pyspark.sql import functions as F2
    emb = _skewed_embeddings(spark)
    s = 5  # ceil(40 / 8)
    cells = (emb.filter(F2.col("label") == "hot")
             .select(F2.pmod(F2.xxhash64("vec_id", F2.lit(7)),
                             F2.lit(s)).alias("cell"))
             .groupBy("cell").count().collect())
    assert len(cells) > 1  # the bucket genuinely spreads over cells
    max_cell = max(r["count"] for r in cells)
    assert max_cell < 40  # no cell inherits the whole bucket
    # per-cell candidate volume: a-side (full bucket) x b-side (one cell)
    assert 40 * max_cell < 40 * 40


# ---------------------------------------------------------------------------
# minhash_lsh_candidates: the (band, key) self-join now rides the shared
# salted_self_join guard — a degenerate LSH bucket (mass-duplicated
# boilerplate, identical signatures) must not become one O(n^2) task, and
# the candidate set must be cap-invariant.
# ---------------------------------------------------------------------------


def _boilerplate_corpus(spark, hot_n=40, uniq_n=4):
    """hot_n docs with IDENTICAL text — every band bucket holds all of
    them (signatures equal by construction, no LSH luck) — plus a few
    unique docs that must not join the hot bucket."""
    rows = [(i, "common boilerplate text repeated everywhere")
            for i in range(hot_n)]
    rows += [(100 + i, f"unique document number {i} entirely different")
             for i in range(uniq_n)]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_lsh_candidates_cap_invariant(spark):
    docs = _boilerplate_corpus(spark)

    def key(rows):
        return {(r["a_id"], r["b_id"]) for r in rows}

    plain = key(dd.minhash_lsh_candidates(
        docs, num_hashes=4, bands=2, k=2, bucket_cap=10**9).collect())
    split = key(dd.minhash_lsh_candidates(
        docs, num_hashes=4, bands=2, k=2, bucket_cap=8,
        max_salts=16).collect())
    # every identical-doc pair is a candidate, and the salt split changes
    # nothing
    assert {(a, b) for a in range(40) for b in range(a + 1, 40)} <= plain
    assert split == plain


def test_lsh_hot_bucket_split_bounds_cell_size(spark):
    """With cap=8 the 40-doc band bucket splits into s=5 cells: the
    largest single join cell sees 40 (replicated a-side) x ~8 (b-side)
    candidates instead of 40 x 40 — mirroring the embedding guard
    (same cell assignment salted_self_join computes)."""
    s = 5  # ceil(40 / 8)
    cells = (spark.range(0, 40)
             .select(F.pmod(F.xxhash64(F.col("id").cast("int"), F.lit(7)),
                            F.lit(s)).alias("cell"))
             .groupBy("cell").count().collect())
    assert len(cells) > 1  # the bucket genuinely spreads over cells
    max_cell = max(r["count"] for r in cells)
    assert max_cell < 40   # no cell inherits the whole bucket
    assert 40 * max_cell < 40 * 40  # per-cell candidate volume shrinks


def test_lsh_candidates_plan_has_salt_scaffold(spark):
    """The optimized plan must carry the guard's cell machinery: the
    pmod cell assignment and the per-bucket cell explode (a plain
    unsalted self-join has neither).  Since the r9 lineage cut, the
    salted join materializes its INPUT once (localCheckpoint), so the
    shingle/band explodes live above the cut — asserted on the bucket
    frame the join consumes — while the salt scaffold itself (pmod +
    a-side cell explode) must stay visible in the join plan."""
    docs = _boilerplate_corpus(spark)
    plan = dd.minhash_lsh_candidates(
        docs, num_hashes=4, bands=2, k=2, bucket_cap=8)._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "pmod" in plan
    assert plan.count("Generate") >= 1   # a-side cell explode
    bplan = dd.band_buckets(docs, num_hashes=4, bands=2, k=2)._jdf \
        .queryExecution().optimizedPlan().toString()
    # shingle explode + band explode feed the (id, band, key) frame
    assert bplan.count("Generate") >= 2


def test_shingle_document_frequency_distinct_docs(spark):
    """df counts DISTINCT documents (a shingle repeated inside one doc
    counts once), and min_df prunes the singleton tail."""
    docs = spark.createDataFrame(
        [(1, "of the of the of the"),   # 'of the' appears 3x IN doc 1
         (2, "of the something else"),
         (3, "entirely different words")],
        "doc_id int, text string")
    got = {r["shingle"]: r["df"]
           for r in dd.shingle_document_frequency(
               docs, k=2, min_df=2).collect()}
    assert got == {"of the": 2}  # 2 docs, not 4 occurrences


# ---------------------------------------------------------------------------
# Corpus-wide line dedup / boilerplate removal (q57/q58 operators)
# ---------------------------------------------------------------------------


def _line_corpus(spark):
    return spark.createDataFrame(
        [(0, "alpha beta gamma delta\n--\ncommon navigation line"),
         (1, "common navigation line\nunique middle sentence\n--"),
         (2, "--\n--\nrepeated inner line\nrepeated inner line"),
         (3, "common navigation line\nanother unique line"),
         ],
        "doc_id int, text string")


def test_line_dedup_first_wins_and_short_exempt(spark):
    """Eligible (≥ min_chars) lines survive only at their first corpus
    (doc_id, pos); short lines are exempt EVERYWHERE — including exact
    repeats within one document."""
    out = {r["doc_id"]: r for r in dd.line_dedup(
        _line_corpus(spark), min_chars=5).collect()}
    assert out[0]["text"] == "alpha beta gamma delta\n--\ncommon navigation line"
    assert (out[0]["kept_lines"], out[0]["dropped_lines"]) == (3, 0)
    # doc 1 loses the common line (doc 0 owns it) but keeps its short '--'
    assert out[1]["text"] == "unique middle sentence\n--"
    assert (out[1]["kept_lines"], out[1]["dropped_lines"]) == (2, 1)
    # within-doc repeat: first occurrence kept, second dropped; the two
    # '--' exempt copies both survive
    assert out[2]["text"] == "--\n--\nrepeated inner line"
    assert (out[2]["kept_lines"], out[2]["dropped_lines"]) == (3, 1)
    assert out[3]["text"] == "another unique line"


def test_line_dedup_winner_is_aggregation_not_window(spark):
    """The first-occurrence winner must come from a combining min-struct
    aggregation: a row_number window would sort a boilerplate line's
    entire posting list (10M rows at corpus scale) in ONE task."""
    plan = dd.line_dedup(_line_corpus(spark))._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "Window" not in plan
    assert "min(" in plan


def test_remove_boilerplate_drops_all_occurrences(spark):
    """df > max_doc_freq lines vanish everywhere (first copy included);
    under-threshold and short lines survive."""
    out = {r["doc_id"]: r for r in dd.remove_boilerplate_lines(
        _line_corpus(spark), max_doc_freq=2, min_chars=5).collect()}
    # 'common navigation line' is in docs 0,1,3 (df=3 > 2): gone from ALL
    assert out[0]["text"] == "alpha beta gamma delta\n--"
    assert (out[0]["kept_lines"], out[0]["dropped_lines"]) == (2, 1)
    assert out[1]["text"] == "unique middle sentence\n--"
    # within-doc repetition does not inflate df: doc 2 untouched (df=1)
    assert out[2]["text"] == "--\n--\nrepeated inner line\nrepeated inner line"
    assert (out[2]["kept_lines"], out[2]["dropped_lines"]) == (4, 0)


def test_remove_boilerplate_broadcast_is_opt_in(spark):
    """The hot-line set is UNBOUNDED at crawl scale (every line with
    df > max_doc_freq — billions of strings on a web corpus with the
    default threshold), so the operator must not force a broadcast: the
    default plan carries no broadcast hint (AQE picks broadcast at
    runtime only when the set is actually small); force_broadcast=True
    re-adds the hint; results are identical either way."""
    df = _line_corpus(spark)
    default_plan = dd.remove_boilerplate_lines(
        df, max_doc_freq=2, min_chars=5)._jdf \
        .queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in default_plan
    assert "ResolvedHint" not in default_plan
    forced_plan = dd.remove_boilerplate_lines(
        df, max_doc_freq=2, min_chars=5, force_broadcast=True)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in forced_plan
    a = sorted(map(tuple, dd.remove_boilerplate_lines(
        df, max_doc_freq=2, min_chars=5).collect()))
    b = sorted(map(tuple, dd.remove_boilerplate_lines(
        df, max_doc_freq=2, min_chars=5, force_broadcast=True).collect()))
    assert a == b


def test_remove_boilerplate_high_df_corpus_no_forced_broadcast(spark):
    """A synthetic high-df corpus (every line hot) through the DEFAULT
    path: correctness holds with no forced broadcast of the hot frame."""
    rows = [(i, "shared hot line number %d\nshared hot line number %d"
             % (i % 5, (i + 1) % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = dd.remove_boilerplate_lines(df, max_doc_freq=3, min_chars=5)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Hint" not in plan
    got = out.agg(F.sum("kept_lines"), F.sum("dropped_lines")).collect()[0]
    # every line has df = 16 > 3: all 80 occurrences dropped
    assert (got[0], got[1]) == (0, 80)


def test_line_doc_frequency_distinct_docs(spark):
    got = {r["line"]: r["df"] for r in dd.line_doc_frequency(
        _line_corpus(spark), min_chars=5, min_df=2).collect()}
    assert got == {"common navigation line": 3}


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components + keep-best (q59/q60)
# ---------------------------------------------------------------------------


def test_connected_components_transitive_chain(spark):
    """A-B-C chained pairs form ONE component labelled by the min id —
    the transitivity minhash_dedup's pairwise rule lacks; pointer
    jumping must close a 6-node path well inside the iteration budget."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # 6-node path
         (10, 11),                                  # separate pair
         (20, 21), (21, 22), (20, 22)],             # triangle
        "a_id bigint, b_id bigint")
    got = {r["id"]: r["component"]
           for r in dd.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_degenerate_inputs(spark):
    """The r9 observe()-sum convergence test must handle the degenerate
    shapes the old changed-count loop handled: an empty pair frame
    (count metric 0 -> empty result, no extra rounds) and a self-loop
    -only graph (labels already converged at round 0's sum)."""
    empty = spark.createDataFrame([], "a_id bigint, b_id bigint")
    assert dd.connected_components(empty).collect() == []
    loop = spark.createDataFrame([(5, 5)], "a_id bigint, b_id bigint")
    got = {r["id"]: r["component"]
           for r in dd.connected_components(loop).collect()}
    assert got == {5: 5}


def test_connected_components_raises_without_convergence(spark):
    import pytest
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "a_id bigint, b_id bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(pairs, max_iter=1)


def test_cluster_dedup_keeps_longest_and_singletons(spark):
    """Within a component the longest doc survives (ties → lowest id);
    docs in no pair are untouched."""
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (4, 50),     # cluster {1,2,3}
         (9, 10)],                                   # singleton
        "doc_id bigint, n_chars bigint")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a_id bigint, b_id bigint")
    kept = sorted(r["doc_id"] for r in dd.cluster_dedup_keep_best(
        docs, pairs).collect())
    # 2 and 3 tie at 300 chars → 2 wins; 4 and 9 unpaired → kept
    assert kept == [2, 4, 9]


def test_line_dedup_idempotent_and_conserving(spark):
    """Invariants: (a) kept+dropped per doc equals the doc's line count;
    (b) a second pass over the deduped corpus is the identity (every
    surviving line is already first-of-its-kind)."""
    docs = _line_corpus(spark)
    once = dd.line_dedup(docs, min_chars=5)
    n_lines = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", F.size(F.split("text", "\n")).alias("n")).collect()}
    for r in once.collect():
        assert r["kept_lines"] + r["dropped_lines"] == n_lines[r["doc_id"]]
    twice = dd.line_dedup(once.select("doc_id", "text"), min_chars=5)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r for r in twice.collect()}
    assert set(a) == set(b)
    for i, t in a.items():
        assert b[i]["text"] == t and b[i]["dropped_lines"] == 0


def test_minhash_dedup_transitive_mode(spark):
    """Chain A~B~C (ends NOT similar): the pairwise rule drops every
    b_id ({2,3}) — losing doc 3's content even though its only similar
    doc was itself dropped; the transitive rule collapses the component
    to ONE survivor, the longest text (doc 3: later w-words are wider).
    Same minhash/verify machinery, different survivor rule."""
    w = [f"w{i}" for i in range(1, 29)]
    docs = spark.createDataFrame(
        [(1, " ".join(w[0:16])), (2, " ".join(w[4:20])),
         (3, " ".join(w[8:24]))],
        "doc_id int, text string")
    kw = dict(num_hashes=4, bands=2, k=2, jaccard_threshold=0.5)
    pairwise = sorted(r["doc_id"]
                      for r in dd.minhash_dedup(docs, **kw).collect())
    transitive = sorted(r["doc_id"] for r in dd.minhash_dedup(
        docs, transitive=True, **kw).collect())
    assert pairwise == [1]
    assert transitive == [3]


# ---------------------------------------------------------------------------
# Incremental (snapshot) dedup: new batch vs existing corpus (q62)
# ---------------------------------------------------------------------------


def test_exact_dedup_hot_digest_and_null_text(spark):
    """Hot-key probe: 200k copies of ONE text (the empty-extraction /
    template-page shape the operator exists to kill) plus uniques plus
    NULL texts.  The combining winner agg + semi-join keeps semantics
    identical to the window formulation it replaced — lowest id wins,
    NULL texts are duplicates of each other — while no single task has
    to sort the hot digest (the plan gate is in test_plan_quality)."""
    n_hot = 200_000
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate page").alias("text"))
    uniq = spark.range(n_hot, n_hot + 500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id")).alias("text"))
    nulls = spark.range(n_hot + 500, n_hot + 503).select(
        F.col("id").alias("doc_id"),
        F.lit(None).cast("string").alias("text"))
    out = dd.exact_dedup(hot.unionAll(uniq).unionAll(nulls))
    assert out.count() == 1 + 500 + 1
    kept_hot = out.filter(F.col("text") == "boilerplate page").collect()
    assert [r["doc_id"] for r in kept_hot] == [0]
    kept_null = out.filter(F.col("text").isNull()).collect()
    assert [r["doc_id"] for r in kept_null] == [n_hot + 500]


def test_incremental_exact_dedup(spark):
    """Batch repeats collapse first-wins; anything already in the corpus
    dies; fresh text survives."""
    corpus = spark.createDataFrame(
        [(1, "seen before text")], "doc_id int, text string")
    new = spark.createDataFrame(
        [(10, "seen before text"),     # corpus dup → dropped
         (11, "fresh new content"),    # survives
         (12, "fresh new content"),    # within-batch dup of 11 → dropped
         (13, "another fresh one")],
        "doc_id int, text string")
    kept = sorted(r["doc_id"] for r in dd.incremental_exact_dedup(
        new, corpus).collect())
    assert kept == [11, 13]


def test_incremental_minhash_only_corpus_matches_drop(spark):
    """A new doc near-dupping another NEW doc is NOT dropped (within-batch
    dedup is a separate pass); near-dupping a CORPUS doc is."""
    base = "the quick brown fox jumps over the lazy dog near the river"
    corpus = spark.createDataFrame(
        [(1, base)], "doc_id int, text string")
    new = spark.createDataFrame(
        [(10, base + " bank"),                  # near-dups corpus → drop
         (11, "completely unrelated prose about sailing ships at sea"),
         (12, "completely unrelated prose about sailing ships at port")],
        "doc_id int, text string")              # 11~12 within batch: kept
    kept = sorted(r["doc_id"] for r in dd.incremental_minhash_dedup(
        new, corpus, num_hashes=4, bands=2, k=2,
        jaccard_threshold=0.5).collect())
    assert kept == [11, 12]


def test_two_sided_salt_guard_cap_invariant(spark):
    """incremental_minhash_dedup results are identical with and without
    the hot-bucket split engaged (bucket_cap far below the corpus bucket
    size vs far above)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(i, base + f" v{i % 3}") for i in range(40)],
        "doc_id int, text string")
    new = spark.createDataFrame(
        [(100, base + " v1 extra"), (101, "totally different words here "
                                          "about nothing in common")],
        "doc_id int, text string")
    kw = dict(num_hashes=4, bands=2, k=2, jaccard_threshold=0.5)
    uncapped = sorted(r["doc_id"] for r in dd.incremental_minhash_dedup(
        new, corpus, bucket_cap=10_000, **kw).collect())
    capped = sorted(r["doc_id"] for r in dd.incremental_minhash_dedup(
        new, corpus, bucket_cap=4, max_salts=8, **kw).collect())
    assert uncapped == capped == [101]


def test_incremental_minhash_recrawl_id_collision(spark):
    """A recrawled doc that REUSES its corpus doc_id must still be caught:
    without side-tagging, the pair normalizes to a_id == b_id, which the
    a < b verify orientation never emits — the true duplicate would
    silently survive (and the two texts' shingle sets would merge under
    one id, corrupting the DF cap)."""
    base = "the quick brown fox jumps over the lazy dog near the river"
    corpus = spark.createDataFrame(
        [(7, base)], "doc_id int, text string")
    new = spark.createDataFrame(
        [(7, base + " again"),   # same id, near-dup text → must drop
         (8, "entirely different content about mountain weather today")],
        "doc_id int, text string")
    kept = sorted(r["doc_id"] for r in dd.incremental_minhash_dedup(
        new, corpus, num_hashes=4, bands=2, k=2,
        jaccard_threshold=0.5).collect())
    assert kept == [8]


def test_connected_components_requires_shared_scratch_on_cluster(spark,
                                                                 monkeypatch):
    """The default scratch dir is driver-local: on a non-local master the
    loop must fail fast with an actionable message, not mid-iteration
    with missing-file errors on the executors."""
    import pytest
    pairs = spark.createDataFrame([(1, 2)], "a_id bigint, b_id bigint")
    monkeypatch.setattr(spark.sparkContext, "master", "spark://host:7077")
    with pytest.raises(ValueError, match="scratch_dir"):
        dd.connected_components(pairs)
    # an explicit scratch dir passes the guard (shared storage contract)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        got = {r["id"]: r["component"] for r in dd.connected_components(
            pairs, scratch_dir=td).collect()}
    assert got == {1: 1, 2: 1}


def test_quality_percentile_cut_per_stratum(spark):
    """The decile cut is calibrated PER stratum: en docs ramp quality by
    word count, de docs all score identically (ties at the cut survive) —
    a global threshold would kill one stratum entirely."""
    from pdf_ocr_batch_ndrocr_lite_spark.operators import curation as cu2
    rows = [(i, "en", "word " * (i + 1)) for i in range(20)]  # ramp
    rows += [(100 + i, "de", "gleich " * 5) for i in range(10)]  # all equal
    docs = spark.createDataFrame(rows, "doc_id int, lang string, text string")
    kept = cu2.quality_percentile_cut(docs, q=0.1)
    by_lang = {"en": [], "de": []}
    for r in kept.collect():
        by_lang[r["lang"]].append(r["doc_id"])
    # en: 20 distinct ascending scores; IEEE 0.1*20 rounds to exactly 2.0
    # -> cut at rank 2 -> rank 1 dropped (percentile_disc keeps the cut)
    assert sorted(by_lang["en"]) == list(range(1, 20))
    # de: every doc ties at the cut value -> all survive
    assert len(by_lang["de"]) == 10


def test_quality_percentile_cut_broadcasts_cut_table(spark):
    """The per-stratum cut table (one row per lang) must come back as a
    broadcast join — re-shuffling the scored corpus on lang to meet a
    10-row table would be a full second exchange of the corpus."""
    from pdf_ocr_batch_ndrocr_lite_spark.operators import curation as cu2
    docs = spark.createDataFrame(
        [(i, "en", "word " * (i + 1)) for i in range(30)],
        "doc_id int, lang string, text string")
    plan = cu2.quality_percentile_cut(docs)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_line_dedup_matches_python_reference_randomized(spark):
    """Differential test: 150 seeded random docs with lines drawn from a
    small pool (forcing heavy cross-doc duplication) — the Spark result
    must equal a direct pure-Python evaluation of the first-wins rule."""
    import random
    rng = random.Random(2024)
    pool = [f"line body number {i} with payload" for i in range(30)] \
        + ["--", "", "x"]  # short/exempt candidates
    rows = [(d, "\n".join(rng.choice(pool)
                          for _ in range(rng.randint(1, 8))))
            for d in range(150)]

    min_chars = 5
    seen = set()
    expect = {}
    for d, text in rows:
        kept_lines, dropped = [], 0
        for line in text.split("\n"):
            if len(line) < min_chars:
                kept_lines.append(line)
            elif line not in seen:
                seen.add(line)
                kept_lines.append(line)
            else:
                dropped += 1
        expect[d] = ("\n".join(kept_lines), len(kept_lines), dropped)

    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: (r["text"], r["kept_lines"], r["dropped_lines"])
           for r in dd.line_dedup(docs, min_chars=min_chars).collect()}
    assert got == expect


def test_remove_boilerplate_matches_python_reference_randomized(spark):
    """Same differential harness for the df > max_doc_freq rule."""
    import collections
    import random
    rng = random.Random(7)
    pool = [f"boiler candidate {i} text" for i in range(12)] + ["--"]
    rows = [(d, "\n".join(rng.choice(pool)
                          for _ in range(rng.randint(1, 6))))
            for d in range(80)]

    min_chars, max_df = 5, 10
    df_count = collections.Counter()
    for d, text in rows:
        for line in set(text.split("\n")):
            if len(line) >= min_chars:
                df_count[line] += 1
    hot = {ln for ln, c in df_count.items() if c > max_df}
    expect = {}
    for d, text in rows:
        kept = [ln for ln in text.split("\n") if ln not in hot]
        expect[d] = ("\n".join(kept), len(kept),
                     len(text.split("\n")) - len(kept))

    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: (r["text"], r["kept_lines"], r["dropped_lines"])
           for r in dd.remove_boilerplate_lines(
               docs, max_doc_freq=max_df, min_chars=min_chars).collect()}
    assert got == expect


def test_embedding_near_dup_blas_mixed_dims_score_at_own_length(spark):
    """Review regression: a pair of mutually equal-length vectors must
    score identically on both kernels even when OTHER rows in the same
    Arrow batch carry a different dimension — per-batch max-dim
    inference made results depend on batch boundaries."""
    emb = spark.createDataFrame(
        [(0, "b", [1.0, 2.0]), (1, "b", [1.0, 2.0]),     # dim-2 dup pair
         (2, "b", [3.0, 4.0, 5.0]), (3, "b", [3.0, 4.0, 5.0])],  # dim-3
        "vec_id int, label string, embedding array<double>")
    for kern in ("exact", "blas"):
        pairs = {(r["a_id"], r["b_id"])
                 for r in dd.embedding_near_dup_pairs(
                     emb, threshold=0.99, kernel=kern).collect()}
        assert pairs == {(0, 1), (2, 3)}, kern


# ---------------------------------------------------------------------------
# simhash_near_dup_pairs: band-candidate exactness + hot-bucket invariance
# ---------------------------------------------------------------------------


def test_simhash_pairs_semantics_and_guards(spark):
    import pytest
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h"), (1, "a b c d e f g h"),  # identical
         (2, "a b c d e f g h"),                          # triple
         (3, "x y z w v u t s")],                         # unrelated
        "doc_id int, text string")
    got = sorted((r["a_id"], r["b_id"], r["hamming"]) for r in
                 dd.simhash_near_dup_pairs(docs).collect())
    assert got == [(0, 1, 0), (0, 2, 0), (1, 2, 0)]
    with pytest.raises(ValueError, match="max_hamming"):
        dd.simhash_near_dup_pairs(docs, bands=3, max_hamming=3)
    with pytest.raises(ValueError, match="divide"):
        dd.simhash_near_dup_pairs(docs, bits=60, bands=7)


def test_simhash_pairs_hot_bucket_split_invariant(spark):
    """A corpus collapsing onto one fingerprint (every band slice hot)
    must yield the same pair set under a tiny bucket_cap (salt split
    engaged) as without it."""
    docs = spark.createDataFrame(
        [(i, "same words in every single document here") for i in range(40)],
        "doc_id int, text string")
    plain = {(r["a_id"], r["b_id"]) for r in
             dd.simhash_near_dup_pairs(docs).collect()}
    split = {(r["a_id"], r["b_id"]) for r in
             dd.simhash_near_dup_pairs(docs, bucket_cap=8).collect()}
    assert plain == split == {(a, b) for a in range(40)
                              for b in range(a + 1, 40)}


# ---------------------------------------------------------------------------
# per_domain_cap mega-domain skew probe (judge r7 item 8)
# ---------------------------------------------------------------------------


def test_per_domain_cap_mega_domain_probe(spark):
    """One domain owns 50% of the corpus (the spam-registrant shape the
    cap exists to kill).  The two-phase pushdown must (a) return exactly
    the cap lowest order keys for the hot domain and the full set for
    small domains, and (b) split the hot key in phase 1: the FIRST
    window partitions by (spark_partition_id, domain), so no task ever
    sorts the whole mega-domain."""
    from pyspark.sql import functions as F
    from pdf_ocr_batch_ndrocr_lite_spark.operators import curation as cu

    n = 100_000
    hot = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://spam.example.com/p"), F.col("id"))
        .alias("url"))
    cold = spark.range(n, 2 * n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://site"), F.col("id") % 50000,
                 F.lit(".org/p")).alias("url"))
    docs = hot.unionAll(cold).repartition(16)
    out = cu.per_domain_cap(docs, cap=3, order_col="doc_id")
    got_hot = sorted(r["doc_id"] for r in out.filter(
        F.col("domain") == "spam.example.com").collect())
    assert got_hot == [0, 1, 2]   # global lowest ids, not per-split ones
    # cold domains have 2 rows each (id, id+50000s pattern -> 2 per key)
    assert out.count() == 3 + cold.count()
    phys = out._jdf.queryExecution().executedPlan().toString()
    # phase 1 splits the hot key across input partitions
    assert "SPARK_PARTITION_ID" in phys.upper()
    assert phys.count("Window [") == 2


def test_exact_quantiles_ranks_over_value_counts(spark):
    """r8: the quantile window must run over PRE-AGGREGATED
    (value, count) pairs — distinct values per group — never over raw
    rows (the un-splittable hot-stratum sort, same class as the r7
    digest-window finding).  percentile_disc picks a VALUE and ties
    share their value, so results are unchanged."""
    from pdf_ocr_batch_ndrocr_lite_spark.operators import quantiles as qt
    df = spark.createDataFrame([("g", 1, i) for i in range(5)]
                               + [("g", 2, 5)], "g string, v int, id int")
    out = qt.exact_quantiles(df, "g", "v", [0.5], tiebreak_col="id")
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in phys          # combining agg below the window
    assert phys.index("Window") < phys.index("partial_count")
    # p50 of [1,1,1,1,1,2]: rank ceil(0.5*6)=3 -> 1 (tied rows collapse)
    assert out.collect()[0]["value"] == 1
