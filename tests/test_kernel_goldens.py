"""Byte-identity of the text kernel vs committed reference-derived goldens.

Goldens under tests/fixtures/ were produced once by tests/tools/gen_goldens.py
driving the reference's own pure helpers; every assertion here is an exact
(byte-for-byte) comparison.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from pdf_ocr_batch_ndrocr_lite_spark.functions import textops as T
from pdf_ocr_batch_ndrocr_lite_spark.operators import extract as E
from pdf_ocr_batch_ndrocr_lite_spark.sources import corpus

FIXTURES = Path(__file__).parent / "fixtures"


def _load(name):
    return json.loads((FIXTURES / name).read_text(encoding="utf-8"))


NORM = _load("normalization.json")
TOKENS = _load("tokens.json")
WRAP = _load("wrap.json")
DOCS = _load("documents.json")
HTML_DOCS = _load("html_documents.json")


@pytest.mark.parametrize("s", sorted(NORM))
def test_normalization_parity(s):
    g = NORM[s]
    assert T.normalize_ocr_text(s) == g["normalize_ocr_text"]
    assert T.collapse_spaces_for_japanese_line(s) == g["collapse_ja"]
    assert T.polish_hidden_line_text(s) == g["polish"]
    assert T.contains_japanese(s) == g["contains_ja"]
    assert T.is_ascii_word_like(s) == g["ascii_word"]


@pytest.mark.parametrize("s", sorted(NORM))
def test_normalization_idempotent(s):
    once = T.normalize_ocr_text(s)
    assert T.normalize_ocr_text(once) == once
    pol = T.polish_hidden_line_text(s)
    assert T.polish_hidden_line_text(pol) == pol


def _toks(case):
    return [T.Token(t["text"], t["x1"], t["y1"], t["x2"], t["y2"])
            for t in case["tokens"]]


@pytest.mark.parametrize("name", sorted(TOKENS))
def test_token_serialization_parity(name):
    case = TOKENS[name]
    toks = _toks(case)
    lines = T.group_tokens_into_lines(toks)
    cols = T.group_tokens_into_vertical_columns(toks)
    assert len(lines) == case["n_lines"]
    assert len(cols) == case["n_cols"]
    assert T.is_vertical_page(toks) == case["is_vertical"]
    assert [T.join_tokens_for_hidden_line(ln) for ln in lines] \
        == case["line_texts"]
    assert [T.join_tokens_for_vertical_hidden_column(c) for c in cols] \
        == case["col_texts"]
    if case["is_vertical"]:
        parts = [T.join_tokens_for_vertical_hidden_column(c) for c in cols]
    else:
        parts = [T.join_tokens_for_hidden_line(ln) for ln in lines]
    assert "\n".join(p for p in parts if p) == case["page_text"]


@pytest.mark.parametrize("s", sorted(WRAP))
def test_wrap_parity(s):
    assert T.wrap_for_hidden_text(s, 60) == WRAP[s]


@pytest.mark.parametrize("idx", sorted(DOCS, key=int))
def test_document_extraction_parity(idx):
    """End-to-end per-url byte identity: our dispatcher vs the reference's
    parse → dedup → group → serialize chain on the same synthetic envelope."""
    golden = DOCS[idx]
    row = corpus.make_row(42, int(idx))
    assert row["url"] == golden["url"]
    envelope = json.loads(row["html"].decode("utf-8"))
    out = E.extract_pdf_document(envelope)
    if out["action"] == E.ACTION_SKIP_HAS_TEXT:
        # skip-path docs still produced parser goldens; extraction is gated
        # earlier — verify the parse itself matches by bypassing the gate
        envelope["pages"] = [
            {**p, "n_chars": 0, "n_text_ops": 0} for p in envelope["pages"]
        ]
        out = E.extract_pdf_document(envelope)
    assert out["extracted_text"] == golden["extracted_text"]
    assert out["token_count"] == golden["token_count"]
    assert out["block_count"] == golden["block_count"]
    assert (out["action"] == E.ACTION_EXTRACTED) == golden["has_any"]


@pytest.mark.parametrize("idx", sorted(HTML_DOCS, key=int))
def test_html_extraction_frozen(idx):
    """HTML path regression pin: our extractor's committed outputs (the
    reference has no HTML route; this freezes the self-defined spec)."""
    golden = HTML_DOCS[idx]
    row = corpus.make_row(42, int(idx))
    assert row["url"] == golden["url"]
    out = E.extract_html_document(bytes(row["html"]))
    assert out["extracted_text"] == golden["extracted_text"]
