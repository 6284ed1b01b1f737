"""WARC source: record splitting, HTTP-header stripping, pipeline feed."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.operators import extract as ex
from pdf_ocr_batch_ndrocr_lite_spark.sources import warc
from pdf_ocr_batch_ndrocr_lite_spark.sources.corpus import make_row


def _warc_records(n=30, start=0):
    recs = []
    for i in range(start, start + n):
        row = make_row(42, i)
        recs.append({"url": row["url"], "warc_ts": row["warc_ts"],
                     "html": bytes(row["html"])})
    return recs


def test_roundtrip_parse():
    recs = _warc_records(20)
    blob = warc.write_warc(recs)
    parsed = warc.parse_warc_records(blob)
    assert len(parsed) == 20
    for orig, got in zip(recs, parsed):
        assert got["url"] == orig["url"]
        assert got["html"] == orig["html"]  # HTTP header block stripped
        assert got["warc_ts"] == orig["warc_ts"].replace(microsecond=0)


def test_non_response_records_skipped():
    recs = _warc_records(3)
    blob = warc.write_warc(recs)
    warcinfo = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 5\r\n\r\nhello\r\n\r\n")
    parsed = warc.parse_warc_records(warcinfo + blob)
    assert len(parsed) == 3


def test_truncated_tail_tolerated():
    blob = warc.write_warc(_warc_records(5))
    parsed = warc.parse_warc_records(blob + b"WARC/1.0\r\nWARC-Type: resp")
    assert len(parsed) == 5


def test_read_warc_feeds_pipeline(spark, tmp_path):
    """WARC files on disk → read_warc → full extraction: same results as
    the parquet path for the same documents."""
    d = tmp_path / "warc"
    d.mkdir()
    for part in range(3):
        recs = _warc_records(20, start=part * 20)
        (d / f"seg-{part}.warc").write_bytes(warc.write_warc(recs))

    pages = warc.read_warc(spark, str(d))
    assert pages.count() == 60
    results = {r["url"]: r for r in ex.run_extraction(pages).collect()}
    for i in range(60):
        row = make_row(42, i)
        expected = ex.extract_one(row["url"], row["html"], row["lang"] or "")
        got = results[row["url"]]
        if got["action"] == ex.ACTION_SKIP_NAME:
            continue
        assert got["extracted_text"] == expected["extracted_text"], row["url"]
