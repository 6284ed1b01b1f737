"""One-time golden-fixture generator.

Drives the REFERENCE's pure helpers (/root/reference/app.py, read-only) over
a deterministic input matrix and freezes the outputs as committed JSON
fixtures under tests/fixtures/.  The engine never imports the reference at
runtime; tests compare our kernel against these committed goldens, making the
byte-identity invariant verifiable standalone.

Run manually when the fixture matrix changes:
    python tests/tools/gen_goldens.py
"""

from __future__ import annotations

import importlib.util
import json
import random
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pdf_ocr_batch_ndrocr_lite_spark.sources import corpus  # noqa: E402

REFERENCE = Path("/root/reference/app.py")
FIXTURES = REPO / "tests" / "fixtures"


def load_reference():
    spec = importlib.util.spec_from_file_location("refapp", str(REFERENCE))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refapp"] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------- string normalization matrix ----------------

NORMALIZATION_INPUTS = [
    "", " ", "hello world", "hello  world ", "日本 語テスト",
    "日本 語テスト abc 123", "価格¥ 100", "価格￥ 250円",
    "（ 注記 ）", "値 ，続き", "● 項目一覧", "• second bullet item",
    "P 12参照", "3 頁から", "25 ページ目", "第 2 章まとめ",
    "abc 123デー タ", "ＡＢＣ １２３", "ｶﾀｶﾅ ﾃｽﾄ", "漢字 々 〆 〤",
    "A B C", "a1 b2 c3", "x = 1 ; y = 2", "tab\there\nnewline",
    "【 見出し 】 本文 。", "『 引用 』 と 「 鍵 」",
    "1 2 3 4 5", "日 本 語 の 文 章 で す",
    "Tokyo 東京 2023 年", "mixed英語and日本語text",
    "spaces   between    runs", "email@example.com / path",
    "50 %引き", "No. 7 番",
]


def gen_normalization_goldens(ref) -> dict:
    out = {}
    for s in NORMALIZATION_INPUTS:
        out[s] = {
            "normalize_ocr_text": ref._normalize_ocr_text(s),
            "collapse_ja": ref._collapse_spaces_for_japanese_line(s),
            "polish": ref._polish_hidden_line_text(s),
            "contains_ja": ref._contains_japanese(s),
            "ascii_word": ref._is_ascii_word_like(s),
        }
    return out


# ---------------- token serialization matrix ----------------


def token_cases() -> dict:
    """Deterministic token sets: corpus page generator + adversarial edges."""
    cases = {}
    for i in range(60):
        rng = random.Random(f"tok:{i}")
        lang = ["ja", "en"][i % 2]
        vertical = i % 7 == 0
        toks = corpus._make_page_tokens(rng, lang, vertical)
        cases[f"page_{i:03d}"] = toks
    # hand-built edges: boundary gap ratios, lookback-8 overflow, ties
    cases["edge_gap_045"] = [
        {"text": "ab", "x1": 0, "y1": 0, "x2": 20, "y2": 20},
        {"text": "cd", "x1": 29.0, "y1": 0, "x2": 49, "y2": 20},   # ratio .45
        {"text": "ef", "x1": 57.9, "y1": 0, "x2": 78, "y2": 20},   # just under
    ]
    cases["edge_gap_090_ja"] = [
        {"text": "AB", "x1": 0, "y1": 0, "x2": 20, "y2": 20},
        {"text": "CD", "x1": 38.0, "y1": 0, "x2": 58, "y2": 20},   # ratio .90
        {"text": "日本", "x1": 80.0, "y1": 0, "x2": 100, "y2": 20},
    ]
    cases["edge_9_lines"] = [
        {"text": f"t{j}", "x1": 0.0, "y1": j * 100.0, "x2": 30.0,
         "y2": j * 100.0 + 20.0}
        for j in range(10)
    ] + [{"text": "back", "x1": 40.0, "y1": 5.0, "x2": 70.0, "y2": 25.0}]
    cases["edge_dup_tokens"] = [
        {"text": "same", "x1": 0, "y1": 0, "x2": 30, "y2": 20},
        {"text": "same", "x1": 0.2, "y1": 0.1, "x2": 30.1, "y2": 20.2},
        {"text": "same ", "x1": 0, "y1": 0, "x2": 30, "y2": 20},
        {"text": "other", "x1": 100, "y1": 0, "x2": 130, "y2": 20},
    ]
    cases["edge_vertical_boundary"] = [
        {"text": c, "x1": 500.0 - 40.0 * (k // 4), "y1": 50.0 + 90.0 * (k % 4),
         "x2": 500.0 - 40.0 * (k // 4) + 24.0, "y2": 50.0 + 90.0 * (k % 4) + 30.0}
        for k, c in enumerate("縦書きテスト八文")
    ]
    return cases


def gen_token_goldens(ref) -> dict:
    out = {}
    for name, toks in token_cases().items():
        rtoks = [ref.OCRToken(text=t["text"], x1=t["x1"], y1=t["y1"],
                              x2=t["x2"], y2=t["y2"]) for t in toks]
        lines = ref._group_tokens_into_lines(rtoks)
        cols = ref._group_tokens_into_vertical_columns(rtoks)
        vertical = ref._is_vertical_page(rtoks)
        if vertical:
            page_lines = [ref._join_tokens_for_vertical_hidden_column(c)
                          for c in cols]
        else:
            page_lines = [ref._join_tokens_for_hidden_line(ln) for ln in lines]
        out[name] = {
            "tokens": toks,
            "is_vertical": vertical,
            "n_lines": len(lines),
            "n_cols": len(cols),
            "line_texts": [ref._join_tokens_for_hidden_line(ln) for ln in lines],
            "col_texts": [ref._join_tokens_for_vertical_hidden_column(c)
                          for c in cols],
            "page_text": "\n".join(p for p in page_lines if p),
        }
    return out


# ---------------- wrap goldens ----------------

WRAP_INPUTS = [
    "short", "a" * 65, "日本語の長い文章" * 12,
    "line one\nline two\n\nline three", "  spaced   out  text  " * 8,
]


def gen_wrap_goldens(ref) -> dict:
    return {s: ref._wrap_for_hidden_text(s, 60) for s in WRAP_INPUTS}


# ---------------- end-to-end document goldens ----------------


def reference_extract_document(ref, envelope: dict, tmp: Path) -> dict:
    """Replay the reference parse+serialize for one corpus envelope by
    materializing its ocr_outputs into a temp dir."""
    pages_meta = envelope["pages"]
    n = len(pages_meta)
    outdir = tmp / "out"
    outdir.mkdir(parents=True)
    pages_dir = tmp / "pages"
    pages_dir.mkdir()
    prepared_pages = [
        ref.PreparedPage(
            index=i, image_path=pages_dir / f"page_{i + 1:04d}.png",
            width_px=pm["width_px"], height_px=pm["height_px"],
            width_pt=pm["width_pt"], height_pt=pm["height_pt"],
            source_label=f"page_{i + 1:04d}",
        )
        for i, pm in enumerate(pages_meta)
    ]
    prepared = ref.PreparedDocument(
        source_path=tmp / "doc.pdf", page_count=n, input_dir=pages_dir,
        pages=prepared_pages, input_kind=ref.INPUT_KIND_PDF,
    )
    for out in envelope.get("ocr_outputs") or []:
        (outdir / out["name"]).write_text(out["payload"], encoding="utf-8")

    parser = ref.OCRResultParser(log=lambda *a, **k: None)
    result = parser.parse(outdir, prepared)

    page_texts = []
    for i in range(n):
        data = result.get(i) or ref.PageOcrData()
        if data.tokens:
            if ref._is_vertical_page(data.tokens):
                parts = [ref._join_tokens_for_vertical_hidden_column(c)
                         for c in ref._group_tokens_into_vertical_columns(data.tokens)]
            else:
                parts = [ref._join_tokens_for_hidden_line(ln)
                         for ln in ref._group_tokens_into_lines(data.tokens)]
            page_texts.append("\n".join(p for p in parts if p))
        elif data.text_blocks:
            lines = []
            for block in data.text_blocks:
                lines.extend(ref._wrap_for_hidden_text(block, 60))
            page_texts.append("\n".join(lines))
        else:
            page_texts.append("")
    doc_text = "\n\n".join(p for p in page_texts if p)
    return {
        "extracted_text": doc_text,
        "token_count": sum(len(v.tokens) for v in result.values()),
        "block_count": sum(len(v.text_blocks) for v in result.values()),
        "has_any": any(v.has_any_text() for v in result.values()),
    }


def gen_document_goldens(ref, n_docs: int = 400, seed: int = 42) -> dict:
    """Goldens for every PDF row among corpus indices [0, n_docs), plus the
    first few giant (200-500 page) documents found beyond that range — the
    skew tail must be byte-verified too."""
    out = {}
    giants = 0
    i = 0
    while i < n_docs or giants < 5:
        if i >= n_docs * 20:  # safety stop
            break
        row = corpus.make_row(seed, i)
        head = bytes(row["html"][:64]).lstrip()
        if not head.startswith(b'{"kind"'):
            i += 1
            continue
        envelope = json.loads(row["html"].decode("utf-8"))
        n_pages = len(envelope["pages"])
        if envelope.get("encrypted"):
            i += 1
            continue
        is_giant = n_pages >= 100
        if i < n_docs and n_pages > 60 and not is_giant:
            i += 1
            continue
        if i >= n_docs and not is_giant:
            i += 1
            continue
        if is_giant:
            if giants >= 5:
                i += 1
                continue
            giants += 1
        with tempfile.TemporaryDirectory() as td:
            golden = reference_extract_document(ref, envelope, Path(td))
        golden["url"] = row["url"]
        out[str(i)] = golden
        i += 1
    return out


def gen_html_goldens(n_docs: int = 400, seed: int = 42) -> dict:
    """Frozen outputs of OUR html extractor (the reference has no HTML path;
    these goldens pin the self-defined spec against regressions)."""
    import sys as _sys
    _sys.path.insert(0, str(REPO))
    from pdf_ocr_batch_ndrocr_lite_spark.functions.html_extract import (
        extract_main_text,
    )
    out = {}
    for i in range(n_docs):
        row = corpus.make_row(seed, i)
        head = bytes(row["html"][:64]).lstrip()
        if head.startswith(b'{"kind"'):
            continue
        if head.startswith(b"%PDF-") or bytes(row["html"][:2]) == b"\xff\xd8" \
                or bytes(row["html"][:8]) == b"\x89PNG\r\n\x1a\n":
            # raw-PDF / image rows never reach the HTML extractor in the
            # pipeline; freezing extract_main_text over their BINARY bytes
            # only couples these goldens to the byte-level corpus layout
            continue
        out[str(i)] = {
            "url": row["url"],
            "extracted_text": extract_main_text(
                row["html"].decode("utf-8", errors="replace")),
        }
    return out


def main() -> None:
    ref = load_reference()
    FIXTURES.mkdir(parents=True, exist_ok=True)
    (FIXTURES / "normalization.json").write_text(
        json.dumps(gen_normalization_goldens(ref), ensure_ascii=False,
                   indent=1), encoding="utf-8")
    (FIXTURES / "tokens.json").write_text(
        json.dumps(gen_token_goldens(ref), ensure_ascii=False, indent=1),
        encoding="utf-8")
    (FIXTURES / "wrap.json").write_text(
        json.dumps(gen_wrap_goldens(ref), ensure_ascii=False, indent=1),
        encoding="utf-8")
    docs = gen_document_goldens(ref)
    (FIXTURES / "documents.json").write_text(
        json.dumps(docs, ensure_ascii=False, indent=1), encoding="utf-8")
    html_docs = gen_html_goldens()
    (FIXTURES / "html_documents.json").write_text(
        json.dumps(html_docs, ensure_ascii=False, indent=1), encoding="utf-8")
    print(f"wrote fixtures: {len(NORMALIZATION_INPUTS)} strings, "
          f"{len(token_cases())} token cases, {len(docs)} documents, "
          f"{len(html_docs)} html documents")


if __name__ == "__main__":
    main()
