"""Relational page assembly must byte-match the fused kernel path."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pdf_ocr_batch_ndrocr_lite_spark.functions import ocr_parse, textops
from pdf_ocr_batch_ndrocr_lite_spark.operators.assemble import (
    assemble_documents,
)
from pdf_ocr_batch_ndrocr_lite_spark.operators.extract import (
    extract_pdf_document, has_text_layer,
)
from pdf_ocr_batch_ndrocr_lite_spark.sources.corpus import make_row


def _page_rows_and_expected(n_docs=120, seed=42):
    rows = []
    expected = {}
    for i in range(n_docs):
        r = make_row(seed, i)
        head = bytes(r["html"][:64]).lstrip()
        if not head.startswith(b'{"kind"'):
            continue
        env = json.loads(r["html"].decode("utf-8"))
        if env.get("encrypted") or has_text_layer(env.get("pages") or []):
            continue
        n = len(env["pages"])
        pages, _ = ocr_parse.parse_envelope(env.get("ocr_outputs") or [], n)
        texts = [textops.serialize_page(pages[j].tokens,
                                        pages[j].text_blocks)
                 for j in range(n)]
        expected[r["url"]] = extract_pdf_document(env)["extracted_text"]
        for j, t in enumerate(texts):
            rows.append((r["url"], j, t))
    return rows, expected


def test_relational_assembly_matches_fused(spark):
    rows, expected = _page_rows_and_expected()
    assert expected, "fixture produced no documents"
    df = spark.createDataFrame(rows,
                               "url string, page_index int, page_text string")
    # shuffle page rows hard: assembly must not depend on input order
    got = {r["url"]: r["extracted_text"]
           for r in assemble_documents(df.repartition(13)).collect()}
    assert got == expected
