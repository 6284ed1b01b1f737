"""Invisible-text overlay computation for the searchable-PDF sink
(SURVEY §2.1 S6/S7) — the reference's ``_draw_overlay_page`` chain
(app.py:2097-2254) as a pure function from parsed page OCR data to draw
operations.

Text CONTENT is byte-identical to the reference: lines come from the same
parity kernels (`group_tokens_into_lines` → `join_tokens_for_hidden_line`,
vertical columns, `wrap_for_hidden_text(…, 60)`).  PLACEMENT follows the
reference formulas exactly along its documented pdfmetrics-unavailable
branch: everywhere reportlab's AFM ``stringWidth`` would be consulted the
reference catches the failure and proceeds with ``width_now = 0.0`` (no
horizontal scaling, font size from the bbox alone, app.py:2130-2133,
2178-2181) and falls back to ``ascent, descent = 0.88·size, −0.12·size``
(app.py:2199-2201) — this module IS that branch, so the emitted geometry
matches the reference run without reportlab installed.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

from . import textops

TextOp = Dict[str, Any]  # kind: "text" | "vtext"


def _line_ops(tokens: Sequence[textops.Token], width_pt: float,
              height_pt: float, sx: float, sy: float) -> List[TextOp]:
    """Horizontal lines (app.py:2103-2157)."""
    ops: List[TextOp] = []
    for line_tokens in textops.group_tokens_into_lines(list(tokens)):
        line_text = textops.join_tokens_for_hidden_line(line_tokens)
        if not line_text:
            continue
        min_x = min(float(t.x1) for t in line_tokens)
        max_y = max(float(t.y2) for t in line_tokens)
        avg_h_px = sum(textops._height(t) for t in line_tokens) \
            / max(1, len(line_tokens))
        bbox_h_pt = max(1.0, avg_h_px * sy)
        x_pt = max(0.0, min_x * sx)
        baseline = height_pt - (max_y * sy) + max(0.5, bbox_h_pt * 0.15)
        font_size = max(4.0, min(72.0, bbox_h_pt * 0.85))
        # the reference clamps the text origin unconditionally so tokens at
        # the very top of the page stay inside it (app.py:2156
        # setTextOrigin(x_pt, max(0.0, min(height_pt - font_size, baseline))))
        y_pt = max(0.0, min(height_pt - font_size, baseline))
        ops.append({"kind": "text", "text": line_text, "x": x_pt,
                    "y": y_pt, "size": font_size})
    return ops


def _column_ops(tokens: Sequence[textops.Token], width_pt: float,
                height_pt: float, sx: float, sy: float) -> List[TextOp]:
    """Vertical columns, rotated -90 (app.py:2159-2227)."""
    ops: List[TextOp] = []
    for column in textops.group_tokens_into_vertical_columns(list(tokens)):
        column_text = textops.join_tokens_for_vertical_hidden_column(column)
        if not column_text:
            continue
        min_x = min(float(t.x1) for t in column)
        max_x = max(float(t.x2) for t in column)
        min_y = min(float(t.y1) for t in column)
        avg_w_px = sum(textops._width(t) for t in column) \
            / max(1, len(column))
        bbox_w_pt = max(1.0, max((max_x - min_x) * sx, avg_w_px * sx))
        x_left_pt = max(0.0, min_x * sx)
        y_top_pt = max(0.0, height_pt - (min_y * sy))
        font_size = max(4.0, min(72.0, bbox_w_pt * 0.92))
        ascent, descent = font_size * 0.88, -font_size * 0.12
        glyph_band_w = max(1.0, float(ascent) - float(descent))
        left_pad = max(0.0, (bbox_w_pt - glyph_band_w) / 2.0)
        ops.append({"kind": "vtext", "text": column_text,
                    "tx": x_left_pt + left_pad - float(descent),
                    "ty": y_top_pt, "size": font_size})
    return ops


def _block_ops(text_blocks: Sequence[str], height_pt: float) -> List[TextOp]:
    """Blocks-only fallback: wrap@60, 8pt lines from 18pt below the top,
    10pt leading, 4pt block gap, stop at y < 12 (app.py:2228-2254)."""
    ops: List[TextOp] = []
    margin_x = 12.0
    current_y = height_pt - 18.0
    for block in text_blocks:
        wrapped = textops.wrap_for_hidden_text(block, 60)
        if not wrapped:
            continue
        for line in wrapped:
            if current_y < 12.0:
                return ops
            ops.append({"kind": "text", "text": line, "x": margin_x,
                        "y": current_y, "size": 8.0})
            current_y -= 10.0
        current_y -= 4.0
    return ops


def page_draw_ops(tokens: Sequence[textops.Token],
                  text_blocks: Sequence[str],
                  width_px: int, height_px: int,
                  width_pt: float, height_pt: float) -> List[TextOp]:
    """The reference's routing: tokens win over blocks; vertical pages take
    the rotated-column path (app.py:2097-2101, 2106-2108)."""
    if tokens:
        sx = width_pt / max(width_px, 1)
        sy = height_pt / max(height_px, 1)
        if textops.is_vertical_page(list(tokens)):
            return _column_ops(tokens, width_pt, height_pt, sx, sy)
        return _line_ops(tokens, width_pt, height_pt, sx, sy)
    if text_blocks:
        return _block_ops(text_blocks, height_pt)
    return []
