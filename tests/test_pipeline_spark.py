"""End-to-end Spark pipeline tests: plumbing, batch invariance, resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.operators import extract as E
from pdf_ocr_batch_ndrocr_lite_spark.plans import checkpoint as ck
from pdf_ocr_batch_ndrocr_lite_spark.plans.pipeline import run_pipeline
from pdf_ocr_batch_ndrocr_lite_spark.sources.corpus import corpus_df, make_row
from pdf_ocr_batch_ndrocr_lite_spark.sources.storage import StorageAdapter

N_DOCS = 300
SEED = 42


@pytest.fixture(scope="module")
def results(spark):
    df = corpus_df(spark, N_DOCS, seed=SEED, partitions=8)
    return {r["url"]: r for r in E.run_extraction(df).collect()}


def test_every_input_accounted(results):
    assert len(results) == N_DOCS


def test_spark_matches_local_dispatch(results):
    """Batch/partition invariance: the distributed run must byte-match a
    local single-threaded dispatch of the same pure function."""
    for i in range(N_DOCS):
        row = make_row(SEED, i)
        expected = E.extract_one(row["url"], row["html"], row["lang"])
        got = results[row["url"]]
        if expected["action"] == E.ACTION_SKIP_NAME or \
                got["action"] == E.ACTION_SKIP_NAME:
            # name-rule rows short-circuit relationally in Spark
            assert row["url"].endswith(("_ocr", "_ocr_001"))
            continue
        assert got["action"] == expected["action"], row["url"]
        assert got["extracted_text"] == expected["extracted_text"], row["url"]
        assert got["page_count"] == expected["page_count"]
        assert got["token_count"] == expected["token_count"]


def test_action_mix(results):
    actions = {r["action"] for r in results.values()}
    assert E.ACTION_EXTRACTED in actions
    assert E.ACTION_SKIP_HAS_TEXT in actions
    assert E.ACTION_SKIP_NAME in actions
    assert E.ACTION_PARSE_FAILURE in actions
    assert E.ACTION_NEEDS_OCR in actions  # raw-PDF scanned-image rows


def test_raw_pdf_rows_in_corpus(results):
    kinds = {r["doc_kind"] for r in results.values()}
    assert "rawpdf" in kinds
    raw = [r for r in results.values() if r["doc_kind"] == "rawpdf"]
    raw_actions = {r["action"] for r in raw}
    # all three raw outcomes appear across 300 docs
    assert {E.ACTION_NEEDS_OCR, E.ACTION_SKIP_HAS_TEXT,
            E.ACTION_PARSE_FAILURE} <= raw_actions


def test_name_rule_matches_spark_rlike(spark, results):
    """The Catalyst RLike predicate and the reference regex agree."""
    import re
    ref_re = re.compile(r"_ocr(?:_\d{3,})?$", re.IGNORECASE)
    for url, r in results.items():
        stem = url.rsplit("/", 1)[-1]
        assert (r["action"] == E.ACTION_SKIP_NAME) == bool(ref_re.search(stem))


def test_pipeline_with_checkpoint_resume(spark, tmp_path):
    out = str(tmp_path / "extractions")
    ckpt = str(tmp_path / "checkpoint")
    storage = StorageAdapter()
    df = corpus_df(spark, 120, seed=SEED, partitions=4)

    totals = run_pipeline(spark, df, output_path=out, checkpoint_path=ckpt,
                          storage=storage, num_buckets=16)
    assert totals["docs"] == 120
    first = spark.read.parquet(out)
    n_first = first.count()
    assert n_first == totals["extracted"] > 0

    # checkpoint covers every bucket that had documents
    ckpt_df = spark.read.parquet(ckpt)
    assert ckpt_df.agg(F.sum("docs")).collect()[0][0] == 120

    # re-run: everything checkpointed → no new output rows (idempotency)
    totals2 = run_pipeline(spark, df, output_path=out, checkpoint_path=ckpt,
                           storage=storage, num_buckets=16)
    assert totals2["docs"] == 0
    assert spark.read.parquet(out).count() == n_first


def test_replay_after_lost_lineage_no_duplicates(spark, tmp_path):
    """Crash-window semantics: output committed but lineage commit lost
    (simulated by deleting the checkpoint table).  The restart re-extracts
    every key — the keyed overwrite sink must REPLACE their output, not
    append next to it."""
    import shutil
    out = str(tmp_path / "extractions")
    ckpt = str(tmp_path / "checkpoint")
    storage = StorageAdapter()
    df = corpus_df(spark, 80, seed=SEED, partitions=4)

    totals = run_pipeline(spark, df, output_path=out, checkpoint_path=ckpt,
                          storage=storage, num_buckets=8)
    n_first = spark.read.parquet(out).count()
    assert n_first == totals["extracted"] > 0

    shutil.rmtree(ckpt)  # the crash: lineage never landed
    totals2 = run_pipeline(spark, df, output_path=out, checkpoint_path=ckpt,
                           storage=storage, num_buckets=8)
    assert totals2["docs"] == 80  # everything replayed...
    final = spark.read.parquet(out)
    assert final.count() == n_first  # ...but nothing duplicated
    assert final.count() == final.select("url").distinct().count()


def test_partial_resume_no_duplicates(spark, tmp_path):
    """Kill-after-partition-k semantics: pre-mark half the buckets done,
    run, then complete; no url appears twice."""
    out = str(tmp_path / "extractions")
    ckpt = str(tmp_path / "checkpoint")
    storage = StorageAdapter()
    df = corpus_df(spark, 100, seed=SEED, partitions=4)

    keyed = ck.with_partition_key(df, 8)
    half = keyed.filter(F.col("partition_key") < 4)
    totals_half = run_pipeline(spark, half.drop("partition_key"),
                               output_path=out, checkpoint_path=ckpt,
                               storage=storage, num_buckets=8)
    assert 0 < totals_half["docs"] < 100

    totals_rest = run_pipeline(spark, df, output_path=out,
                               checkpoint_path=ckpt, storage=storage,
                               num_buckets=8)
    assert totals_half["docs"] + totals_rest["docs"] == 100

    final = spark.read.parquet(out)
    assert final.count() == final.select("url").distinct().count()


def test_image_rows_in_corpus(results):
    kinds = {r["doc_kind"] for r in results.values()}
    assert "image" in kinds
    imgs = [r for r in results.values() if r["doc_kind"] == "image"]
    img_actions = {r["action"] for r in imgs}
    # readable images route to OCR; truncated fetches fail cleanly
    assert E.ACTION_NEEDS_OCR in img_actions
    for r in imgs:
        assert r["action"] in (E.ACTION_NEEDS_OCR, E.ACTION_PARSE_FAILURE)


def test_merge_upsert_accepts_file_scheme(spark, tmp_path):
    """file:// is a LOCAL path: the parquet fallback's os-level swap must
    strip the scheme instead of silently missing the existing table (a
    miss would drop checkpoint history on every merge)."""
    from pdf_ocr_batch_ndrocr_lite_spark.sources.storage import StorageAdapter
    st = StorageAdapter()
    path = "file://" + str(tmp_path / "ckpt")
    df1 = spark.createDataFrame([(1, 10, 1)], "k int, v int, ts int")
    st.merge_upsert(spark, path, df1, ["k"], "ts")
    df2 = spark.createDataFrame([(1, 20, 2), (2, 5, 1)],
                                "k int, v int, ts int")
    st.merge_upsert(spark, path, df2, ["k"], "ts")
    got = {r["k"]: r["v"] for r in st.read(spark, path).collect()}
    assert got == {1: 20, 2: 5}  # newest-wins AND history preserved
    import pytest as _pt
    with _pt.raises(ValueError):
        st.merge_upsert(spark, "s3://bucket/ckpt", df1, ["k"], "ts")


def test_run_meta_written_and_continuity_enforced(spark, tmp_path):
    """Run-config meta rows (the reference CSV meta header re-expressed,
    app.py:1115-1142): every run appends one row; a resume with a
    different num_buckets — a different partition_key universe — must
    fail fast instead of mis-keying the anti-join."""
    import pytest as _pytest

    out = str(tmp_path / "extractions")
    ckpt = str(tmp_path / "checkpoint")
    storage = StorageAdapter()
    df = corpus_df(spark, 60, seed=SEED, partitions=4)

    run_pipeline(spark, df, output_path=out, checkpoint_path=ckpt,
                 storage=storage, num_buckets=16)
    meta = spark.read.parquet(ck.meta_path(ckpt))
    rows = meta.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["num_buckets"] == 16 and r["app_name"]
    assert len(r["code_version"]) == 12 and r["created_at"] is not None

    # resume with the SAME config: appends a second row, same hash
    run_pipeline(spark, df, output_path=out, checkpoint_path=ckpt,
                 storage=storage, num_buckets=16)
    rows2 = spark.read.parquet(ck.meta_path(ckpt)).collect()
    assert len(rows2) == 2
    assert len({x["config_hash"] for x in rows2}) == 1

    # resume with a DIFFERENT key universe: hard error before any work
    with _pytest.raises(ValueError, match="num_buckets"):
        run_pipeline(spark, df, output_path=out, checkpoint_path=ckpt,
                     storage=storage, num_buckets=32)
    # nothing extra was appended by the failed attempt
    assert spark.read.parquet(ck.meta_path(ckpt)).count() == 2
