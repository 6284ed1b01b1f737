"""Searchable-PDF sink (SURVEY §2.1 S6/S7): parsed OCR envelope → a REAL
PDF with an invisible text layer (render mode 3), one per document.

Round-1 captured only the semantic text form of this sink; this operator
produces actual PDF bytes: the overlay lines come from the same parity
kernels as `extracted_text` (so the hidden layer of a token page is
byte-identical to that page's pipeline output — locked by
tests/test_sink_pdf.py), placement follows the reference formulas along
its pdfmetrics-unavailable branch (functions/pdf_overlay.py), and page
images ride in as DCTDecode passthrough when the envelope carries JPEG
bytes (no codec needed — app.py:2257-2451 is the reportlab analogue).

Scale shape: one mapInPandas stage, document-parallel, output is one
binary column — the natural sink is a parquet/Iceberg table of
(url, pdf); writing one million small PDFs as FILES would be a small-files
disaster at 100 TB, so the engine keeps them as table rows and leaves
fan-out-to-object-store to a downstream exporter.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions import ocr_parse, pdf_make, pdf_overlay

SINK_SCHEMA = ("url string, pdf binary, page_count int, n_text_ops int, "
               "n_bytes bigint")


def searchable_pdf_sink(docs: DataFrame, url_col: str = "url",
                        payload_col: str = "html") -> DataFrame:
    """(url, pdf, page_count, n_text_ops, n_bytes) for every parseable,
    non-encrypted PDF-envelope document; other rows contribute nothing
    (callers recover skipped docs with an anti-join, same contract as
    pdf_page_stats)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "pdf", "page_count", "n_text_ops", "n_bytes"]
        for pdf_batch in batches:
            if len(pdf_batch) == 0:
                continue
            out: dict = {c: [] for c in cols}
            for url, payload in zip(pdf_batch[url_col],
                                    pdf_batch[payload_col]):
                try:
                    raw = bytes(payload or b"")
                    if not raw.lstrip().startswith(b"{"):
                        continue
                    envelope = json.loads(raw.decode("utf-8"))
                    if not (isinstance(envelope, dict)
                            and envelope.get("kind") == "pdf") \
                            or envelope.get("encrypted"):
                        continue
                    pages_meta = envelope.get("pages") or []
                    parsed, _stats = ocr_parse.parse_envelope(
                        envelope.get("ocr_outputs") or [], len(pages_meta))
                    specs = []
                    n_ops = 0
                    for i, meta in enumerate(pages_meta):
                        page = parsed[i]
                        w_pt = float(meta.get("width_pt") or 612.0)
                        h_pt = float(meta.get("height_pt") or 792.0)
                        ops = pdf_overlay.page_draw_ops(
                            page.tokens, page.text_blocks,
                            int(meta.get("width_px") or 1),
                            int(meta.get("height_px") or 1),
                            w_pt, h_pt)
                        n_ops += len(ops)
                        jpeg = meta.get("jpeg")
                        specs.append({"width_pt": w_pt, "height_pt": h_pt,
                                      "ops": ops,
                                      "jpeg": bytes(jpeg) if jpeg else None})
                    if not specs:
                        continue
                    data = pdf_make.build_searchable_pdf(specs)
                except Exception:
                    continue  # never-throw: unparseable docs emit no row
                out["url"].append(url)
                out["pdf"].append(data)
                out["page_count"].append(len(specs))
                out["n_text_ops"].append(n_ops)
                out["n_bytes"].append(len(data))
            yield pd.DataFrame(out, columns=cols)

    return docs.select(url_col, payload_col) \
        .mapInPandas(run, schema=SINK_SCHEMA)
