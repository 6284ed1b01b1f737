"""Multimodal binary-column plumbing (decode stubbed; Spark shapes real)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.operators import multimodal as mm

SF_DIR = "/root/testdata/sf0.001"


def _media(spark, n=100):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .filter(F.col("doc_id") < n)
    return mm.attach_media(docs)


def test_media_features_shapes(spark):
    media = _media(spark)
    feats = mm.media_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:10]:
        assert len(r["feature"]) == 8
        assert all(-1.0 <= v <= 1.0 for v in r["feature"])
        assert r["n_frames"] >= 1
        assert len(r["digest"]) == 32


def test_media_features_deterministic(spark):
    media = _media(spark, 30)
    a = {r["media_id"]: r["digest"]
         for r in mm.media_features(media).collect()}
    b = {r["media_id"]: r["digest"]
         for r in mm.media_features(media.repartition(7)).collect()}
    assert a == b


def test_sample_frames_fanout(spark):
    media = _media(spark, 60)
    frames = mm.sample_frames(media, every_ms=1000)
    agg = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("frame_index").alias("max_idx")).collect()
    by_id = {r["media_id"]: r for r in agg}
    kinds = {r["media_id"]: (r["kind"], r["duration_ms"])
             for r in media.collect()}
    for mid, (kind, dur) in kinds.items():
        expected = 1 if kind == "image" else min(max(1, dur // 1000), 64)
        assert by_id[mid]["n"] == expected, (mid, kind, dur)
        assert by_id[mid]["max_idx"] == expected - 1
    # frame payloads are distinct per (media, index)
    assert frames.select("frame").distinct().count() == frames.count()


def test_summary_matches_inputs(spark):
    media = _media(spark)
    s = {r["kind"]: r for r in mm.media_summary(media).collect()}
    assert set(s) == {"image", "audio", "video"}
    assert sum(r["n_items"] for r in s.values()) == media.count()
