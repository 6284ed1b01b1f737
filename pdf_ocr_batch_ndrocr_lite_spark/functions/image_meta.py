"""Image normalization metadata (SURVEY §2.1 S4) — the reference's
``_prepare_image`` semantics (app.py:1470-1520) over raw JPEG/PNG bytes
with the stdlib only.

The reference opens the image with Pillow, reads the DPI metadata
(default 150), normalizes it through ``_normalize_dpi_value`` (accepted
range [20, 1200], else 150 — app.py:3911-3918), and derives the single
prepared page's point size as ``px * 72.0 / dpi``.  All of that is
METADATA work: JPEG dimensions live in the SOF marker and density in the
JFIF APP0 header; PNG dimensions live in IHDR and density in pHYs — both
parseable without any codec.  Only pixel DECODE would need an imaging
library; that stays behind the honest stub in operators/multimodal.py.
"""

from __future__ import annotations

import struct
from typing import Dict, Optional

DEFAULT_IMAGE_DPI = 150.0  # app.py:91


class ImageParseError(ValueError):
    """Structurally unreadable image (reference: '画像の読み込みに失敗'
    → RuntimeError, app.py:1494)."""


def normalize_dpi_value(value) -> float:
    """app.py:3911-3918 exactly."""
    try:
        v = float(value)
    except Exception:
        return DEFAULT_IMAGE_DPI
    if v < 20 or v > 1200:
        return DEFAULT_IMAGE_DPI
    return v


def _jpeg_meta(data: bytes) -> Dict[str, float]:
    w = h = None
    dpi_x: Optional[float] = None
    dpi_y: Optional[float] = None
    i = 2
    n = len(data)
    while i + 4 <= n and data[i] == 0xFF:
        marker = data[i + 1]
        if marker in (0xD8, 0xD9):  # SOI/EOI have no length
            i += 2
            continue
        if i + 4 > n:
            break
        seg_len = int.from_bytes(data[i + 2:i + 4], "big")
        seg = data[i + 4:i + 2 + seg_len]
        if marker == 0xE0 and seg[:5] == b"JFIF\x00" and len(seg) >= 12:
            units = seg[7]
            xd = int.from_bytes(seg[8:10], "big")
            yd = int.from_bytes(seg[10:12], "big")
            if units == 1:        # dots per inch
                dpi_x, dpi_y = float(xd), float(yd)
            elif units == 2:      # dots per cm (Pillow converts the same)
                dpi_x, dpi_y = xd * 2.54, yd * 2.54
            # units == 0: aspect ratio only → no dpi info (default applies)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            break
        i += 2 + seg_len
    if not w or not h:
        raise ImageParseError("jpeg: no SOF frame header")
    return {"format": "jpeg", "width_px": w, "height_px": h,
            "dpi_x": dpi_x, "dpi_y": dpi_y}


def _png_meta(data: bytes) -> Dict[str, float]:
    if len(data) < 33 or data[12:16] != b"IHDR":
        raise ImageParseError("png: missing IHDR")
    w, h = struct.unpack(">II", data[16:24])
    if not w or not h:
        raise ImageParseError("png: zero dimension")
    dpi_x = dpi_y = None
    i = 8
    while i + 8 <= len(data):
        length = int.from_bytes(data[i:i + 4], "big")
        ctype = data[i + 4:i + 8]
        if ctype == b"pHYs" and length >= 9:
            px_m, py_m, unit = struct.unpack(
                ">IIB", data[i + 8:i + 17])
            if unit == 1:  # pixels per metre → dpi (Pillow does the same)
                dpi_x, dpi_y = px_m * 0.0254, py_m * 0.0254
            break
        if ctype == b"IDAT" or ctype == b"IEND":
            break
        i += 12 + length
    return {"format": "png", "width_px": w, "height_px": h,
            "dpi_x": dpi_x, "dpi_y": dpi_y}


def png_pixel_info(data: bytes) -> Dict[str, object]:
    """IHDR pixel layout + concatenated IDAT bytes for the codec-free PDF
    embed: PNG IDAT is already zlib data with per-row predictor bytes, i.e.
    exactly a PDF FlateDecode image stream with /DecodeParms PNG predictors
    — no re-encode needed.  Supported: non-interlaced 8-bit grayscale
    (color type 0) and RGB (type 2); palette/alpha types need a real pixel
    transform, which is decode-stub territory."""
    if data[:8] != b"\x89PNG\r\n\x1a\n" or data[12:16] != b"IHDR":
        raise ImageParseError("png: missing IHDR")
    w, h = struct.unpack(">II", data[16:24])
    bit_depth, color_type, _comp, _filt, interlace = data[24:29]
    if interlace:
        raise ImageParseError("png: interlaced (Adam7) not embeddable")
    if color_type not in (0, 2) or bit_depth != 8:
        raise ImageParseError(
            f"png: color type {color_type}/depth {bit_depth} needs a pixel "
            "transform (palette/alpha) — decode stub territory")
    idat = bytearray()
    i = 8
    while i + 8 <= len(data):
        length = int.from_bytes(data[i:i + 4], "big")
        ctype = data[i + 4:i + 8]
        if ctype == b"IDAT":
            idat += data[i + 8:i + 8 + length]
        elif ctype == b"IEND":
            break
        i += 12 + length
    if not idat:
        raise ImageParseError("png: no IDAT pixel data")
    return {"width_px": int(w), "height_px": int(h),
            "bit_depth": int(bit_depth),
            "colors": 3 if color_type == 2 else 1,
            "idat": bytes(idat)}


def sniff_image(data: bytes) -> Optional[str]:
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return None


def prepare_image(data: bytes) -> Dict[str, float]:
    """The reference's prepared single page: dimensions, normalized dpi,
    and the px→pt projection (app.py:1482-1492).  Missing density metadata
    takes the 150 dpi default BEFORE normalization, exactly like
    ``im.info.get("dpi", (150, 150))``."""
    kind = sniff_image(bytes(data or b""))
    if kind == "jpeg":
        meta = _jpeg_meta(bytes(data))
    elif kind == "png":
        meta = _png_meta(bytes(data))
    else:
        raise ImageParseError("not a supported image")
    dpi_x = normalize_dpi_value(
        meta["dpi_x"] if meta["dpi_x"] is not None else DEFAULT_IMAGE_DPI)
    dpi_y = normalize_dpi_value(
        meta["dpi_y"] if meta["dpi_y"] is not None else dpi_x)
    w, h = meta["width_px"], meta["height_px"]
    return {
        "format": meta["format"],
        "width_px": w, "height_px": h,
        "dpi_x": dpi_x, "dpi_y": dpi_y,
        "width_pt": w * 72.0 / dpi_x,
        "height_pt": h * 72.0 / dpi_y,
        "page_count": 1,
    }


# ---------------------------------------------------------------------------
# Synthesis helpers (tests/corpus only): minimal-but-real image headers with
# deterministic fake pixel bodies.
# ---------------------------------------------------------------------------


def make_fake_jpeg(width: int, height: int, dpi: Optional[int] = None,
                   units: int = 1) -> bytes:
    """SOI + JFIF APP0 (+density) + SOF0 + fake scan + EOI."""
    d = dpi if dpi is not None else 0
    app0 = (b"JFIF\x00\x01\x02" + bytes([units if dpi is not None else 0])
            + d.to_bytes(2, "big") + d.to_bytes(2, "big") + b"\x00\x00")
    sof = (b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big")
           + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    return (b"\xff\xd8"
            + b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
            + b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
            + b"fakescan" * 4 + b"\xff\xd9")


def make_fake_png(width: int, height: int,
                  dpi: Optional[float] = None,
                  with_pixels: bool = False,
                  color_type: int = 2) -> bytes:
    """Signature + IHDR (+pHYs) (+IDAT) + IEND; CRCs are zeroed (the
    metadata parser doesn't verify them, matching crawl tolerance).
    ``with_pixels`` writes a REAL zlib IDAT of deterministic scanlines
    (filter types 0 and 2 alternating) so the codec-free PDF embed has
    actual pixel data to carry."""
    import zlib as _z

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (len(body).to_bytes(4, "big") + ctype + body
                + b"\x00\x00\x00\x00")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if dpi is not None:
        ppm = round(dpi / 0.0254)
        out += chunk(b"pHYs", struct.pack(">IIB", ppm, ppm, 1))
    if with_pixels:
        channels = 3 if color_type == 2 else 1
        raw = bytearray()
        prev = bytes(width * channels)
        for r in range(height):
            row = bytes((r * 31 + c * 7) % 251
                        for c in range(width * channels))
            if r % 2 == 0:
                raw.append(0)          # filter: None
                raw += row
            else:
                raw.append(2)          # filter: Up
                raw += bytes((row[j] - prev[j]) & 0xFF
                             for j in range(len(row)))
            prev = row
        out += chunk(b"IDAT", _z.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")
