"""Cleaning / PII-scrub operators: exact rewrite semantics pinned."""

from __future__ import annotations

from pdf_ocr_batch_ndrocr_lite_spark.operators import cleaning as cl


def test_clean_text_exact(spark):
    docs = spark.createDataFrame(
        [(1, "\x01 hello \t\t world\x07\n\n\n\n\nnext  para  "),
         (2, "already clean")],
        "doc_id int, text string")
    got = {r["doc_id"]: r for r in cl.clean_text(docs).collect()}
    assert got[1]["text"] == "hello world\n\nnext para"
    # removed: \x01, \x07, collapsed whitespace, 3 of 5 newlines, trims
    assert got[1]["n_chars_removed"] == \
        len("\x01 hello \t\t world\x07\n\n\n\n\nnext  para  ") \
        - len("hello world\n\nnext para")
    assert got[2]["text"] == "already clean"
    assert got[2]["n_chars_removed"] == 0


def test_pii_scrub_placeholders_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org or 192.168.0.1 "
             "call (555) 867-5309 now"),
         (2, "version 3.14 build 2023 — no pii here"),
         ],
        "doc_id int, text string")
    got = {r["doc_id"]: r for r in cl.pii_scrub(docs).collect()}
    assert got[1]["text"] == "mail <EMAIL> or <IP> call <PHONE> now"
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) \
        == (1, 1, 1)
    # precision bias: bare decimals / years are untouched
    assert got[2]["text"] == "version 3.14 build 2023 — no pii here"
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) \
        == (0, 0, 0)
