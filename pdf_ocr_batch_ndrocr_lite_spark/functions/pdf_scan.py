"""Raw-PDF byte scanning: the reference's text-layer predicate over actual
PDF content streams, reimplemented with the stdlib only (re over bytes,
zlib, hashlib) — no pypdf in this environment.

Reference parity targets (read-only /root/reference/app.py):
- ``_TEXT_SHOW_OPERATOR_RE`` — the exact text-show operator byte regex
  (app.py:1156).
- ``has_text_layer`` — per-page cumulative chars/ops walk over at most
  ``pages_to_check`` pages with early exit as soon as either threshold is
  met (app.py:1192-1248 loop structure, including the
  ``min(total_pages, max(1, pages_to_check))`` clamp).
- encrypted PDFs: an EMPTY-password decrypt is attempted first; only if
  that fails is the document rejected (app.py:1178-1189 → RuntimeError →
  the caller's parse-failure row).  Standard security handler V1/V2
  (RC4, R2/R3) is supported — the container has no crypto libs, so AESV2+
  documents fail the attempt exactly like a wrong password.
- ``_count_text_show_ops`` — operator count over the concatenated decoded
  content streams of a page; any per-page decode error counts as 0 ops
  (app.py:1265-1278 swallows exceptions the same way).

Char counting caveat (documented divergence): pypdf's ``extract_text``
decodes glyphs through font encodings/CMaps; this scanner counts the bytes
of the literal/hex show-strings with PDF escapes resolved and whitespace
removed (the reference also strips whitespace before counting,
app.py:1221).  For simple single-byte fonts — and for every document this
engine synthesizes — the two counts agree.
"""

from __future__ import annotations

import re
import zlib
from hashlib import md5
from typing import Dict, List, Optional, Tuple

# app.py:1156 — byte-identical pattern.
TEXT_SHOW_OPERATOR_RE = re.compile(rb'(?<![A-Za-z])(Tj|TJ|\'|")(?=[^A-Za-z]|$)')

# Thresholds (app.py:98-100) — re-exported by operators.extract.
MIN_TEXT_LAYER_CHARS = 10
MIN_TEXT_SHOW_OPS = 1
DEFAULT_TEXT_LAYER_CHECK_PAGES = 20

_PDF_WHITESPACE = b"\x00\t\n\x0c\r "

# Standard security handler padding string (PDF 32000-1:2008, 7.6.3.3).
_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


class PdfParseError(ValueError):
    """Structurally unreadable PDF (reference: 'PDF 読み込み失敗' →
    RuntimeError, app.py:1176)."""


class EncryptedPdfError(ValueError):
    """Encrypted and the empty-password decrypt attempt failed
    (app.py:1180-1189)."""


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (the PDF standard security handler's V1/V2 cipher)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# Minimal object-level parser.  No xref walking: objects are located by
# scanning for `N G obj ... endobj`, which is robust to the linearized /
# incremental layouts a crawl actually sees and never trusts /Length.
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")


class _Obj:
    __slots__ = ("num", "gen", "body", "dict_src", "stream")

    def __init__(self, num: int, gen: int, body: bytes,
                 dict_src: bytes, stream: Optional[bytes]) -> None:
        self.num = num
        self.gen = gen
        self.body = body
        self.dict_src = dict_src
        self.stream = stream


def _find_dict(body: bytes) -> bytes:
    """First balanced << ... >> region of an object body ('' if none)."""
    start = body.find(b"<<")
    if start < 0:
        return b""
    depth = 0
    i = start
    while i < len(body) - 1:
        two = body[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _parse_objects(data: bytes) -> Dict[int, _Obj]:
    objs: Dict[int, _Obj] = {}
    for m in _OBJ_RE.finditer(data):
        num, gen = int(m.group(1)), int(m.group(2))
        end = data.find(b"endobj", m.end())
        body = data[m.end(): end if end >= 0 else len(data)]
        dict_src = _find_dict(body)
        stream = None
        sm = re.search(rb"stream\r?\n", body)
        if sm:
            send = body.find(b"endstream", sm.end())
            if send >= 0:
                raw = body[sm.end():send]
                # writers may pad a trailing EOL before `endstream`
                if raw.endswith(b"\r\n"):
                    raw = raw[:-2]
                elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                    raw = raw[:-1]
                stream = raw
        objs[num] = _Obj(num, gen, body, dict_src, stream)
    return objs


def _dict_ref(dict_src: bytes, key: bytes) -> Optional[int]:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R\b", dict_src)
    return int(m.group(1)) if m else None


def _dict_int(dict_src: bytes, key: bytes) -> Optional[int]:
    m = re.search(re.escape(key) + rb"\s+([+-]?\d+)(?![\d.])", dict_src)
    return int(m.group(1)) if m else None


def _dict_string(dict_src: bytes, key: bytes) -> Optional[bytes]:
    """Literal ``(...)`` or hex ``<...>`` string value for `key`."""
    m = re.search(re.escape(key) + rb"\s*(\(|<(?!<))", dict_src)
    if not m:
        return None
    if m.group(1) == b"(":
        s, _ = _read_literal_string(dict_src, m.end() - 1)
        return s
    end = dict_src.find(b">", m.end())
    if end < 0:
        return None
    hx = re.sub(rb"\s+", b"", dict_src[m.end():end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _read_literal_string(data: bytes, open_paren: int) -> Tuple[bytes, int]:
    """Decode a PDF literal string starting at `open_paren` ('(').
    Returns (decoded bytes, index just past the closing paren)."""
    out = bytearray()
    i = open_paren + 1
    depth = 1
    while i < len(data):
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(data):
                break
            e = data[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                            0x62: 8, 0x66: 12}[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = data[i:i + 3]
                n = 0
                used = 0
                for d in oct_digits:
                    if 0x30 <= d <= 0x37 and used < 3:
                        n = n * 8 + (d - 0x30)
                        used += 1
                    else:
                        break
                out.append(n & 0xFF)
                i += used
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < len(data) and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


# ---------------------------------------------------------------------------
# Encryption: standard handler, V1/V2 (RC4), revisions 2 and 3.
# ---------------------------------------------------------------------------


class _Decryptor:
    def __init__(self, key: bytes) -> None:
        self._key = key

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        k = md5(self._key + num.to_bytes(3, "little")
                + gen.to_bytes(2, "little")).digest()
        return rc4(k[:min(len(self._key) + 5, 16)], data)


def _first_file_id(data: bytes) -> bytes:
    m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", data)
    if not m:
        return b""
    hx = re.sub(rb"\s+", b"", m.group(1))
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _auth_empty_password(data: bytes, objs: Dict[int, _Obj]
                         ) -> Optional[_Decryptor]:
    """The reference's `reader.decrypt("")` attempt (app.py:1180-1189):
    returns a stream decryptor if the EMPTY user password authenticates,
    raises EncryptedPdfError otherwise.  None = document not encrypted."""
    em = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R\b", data)
    if not em:
        return None
    enc_obj = objs.get(int(em.group(1)))
    if enc_obj is None:
        raise EncryptedPdfError("encrypted: missing /Encrypt object")
    d = enc_obj.dict_src
    v = _dict_int(d, b"/V") or 0
    r = _dict_int(d, b"/R") or 2
    if v not in (1, 2) or r not in (2, 3):
        # AESV2/V3 etc.: no crypto libs here — the empty-password attempt
        # fails exactly like a wrong password would
        raise EncryptedPdfError(f"encrypted: unsupported V={v} R={r}")
    o = _dict_string(d, b"/O") or b""
    u = _dict_string(d, b"/U") or b""
    p = _dict_int(d, b"/P") or 0
    keybits = _dict_int(d, b"/Length") or 40
    keylen = keybits // 8 if v == 2 else 5
    file_id = _first_file_id(data)

    h = md5(_PAD + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + file_id)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = md5(key[:keylen]).digest()
    key = key[:keylen]

    if r == 2:
        ok = rc4(key, _PAD) == u[:32]
    else:
        expect = md5(_PAD + file_id).digest()
        x = expect
        for i in range(20):
            x = rc4(bytes(b ^ i for b in key), x)
        ok = x == u[:16]
    if not ok:
        raise EncryptedPdfError("encrypted: empty-password decrypt failed")
    return _Decryptor(key)


# ---------------------------------------------------------------------------
# Page tree walk + content stream decode.
# ---------------------------------------------------------------------------


def _page_order(data: bytes, objs: Dict[int, _Obj]) -> List[int]:
    """Page object numbers in document order: walk the catalog's /Pages
    tree when present, fall back to object-scan order."""
    root_num = None
    m = re.search(rb"/Root\s+(\d+)\s+\d+\s+R\b", data)
    if m and int(m.group(1)) in objs:
        root_num = int(m.group(1))
    else:
        for o in objs.values():
            if re.search(rb"/Type\s*/Catalog\b", o.dict_src):
                root_num = o.num
                break
    pages: List[int] = []
    seen = set()

    def walk(num: int) -> None:
        if num in seen or num not in objs:
            return
        seen.add(num)
        o = objs[num]
        if re.search(rb"/Type\s*/Pages\b", o.dict_src):
            km = re.search(rb"/Kids\s*\[(.*?)\]", o.dict_src, re.S)
            if km:
                for rm in _REF_RE.finditer(km.group(1)):
                    walk(int(rm.group(1)))
        elif re.search(rb"/Type\s*/Page\b", o.dict_src):
            pages.append(num)

    if root_num is not None:
        pages_ref = _dict_ref(objs[root_num].dict_src, b"/Pages")
        if pages_ref is not None:
            walk(pages_ref)
    if not pages:  # damaged tree: recover in scan order (crawl reality)
        pages = [o.num for o in sorted(objs.values(), key=lambda x: x.num)
                 if re.search(rb"/Type\s*/Page\b", o.dict_src)]
    return pages


def _decode_stream(obj: _Obj, dec: Optional[_Decryptor]) -> bytes:
    raw = obj.stream or b""
    if dec is not None:
        raw = dec.decrypt(raw, obj.num, obj.gen)
    if re.search(rb"/Filter\s*(\[\s*)?/FlateDecode\b", obj.dict_src):
        raw = zlib.decompress(raw)
    elif re.search(rb"/Filter\s*/", obj.dict_src):
        raise PdfParseError("unsupported stream filter")
    return raw


def page_content_streams(data: bytes) -> List[bytes]:
    """Decoded, concatenated content stream per page, in page order.

    Raises PdfParseError for structurally unreadable files and
    EncryptedPdfError when the empty-password attempt fails; PER-PAGE
    decode problems degrade to an empty stream (the reference counts such
    pages as 0 ops / 0 chars, app.py:1265-1278)."""
    if not data.lstrip()[:5] == b"%PDF-":
        raise PdfParseError("missing %PDF- header")
    objs = _parse_objects(data)
    if not objs:
        raise PdfParseError("no objects")
    dec = _auth_empty_password(data, objs)
    out: List[bytes] = []
    for pnum in _page_order(data, objs):
        page = objs[pnum]
        chunks: List[bytes] = []
        cm = re.search(rb"/Contents\s*\[(.*?)\]", page.dict_src, re.S)
        refs = ([int(r.group(1)) for r in _REF_RE.finditer(cm.group(1))]
                if cm else [])
        if not refs:
            ref = _dict_ref(page.dict_src, b"/Contents")
            refs = [ref] if ref is not None else []
        for ref in refs:
            cobj = objs.get(ref)
            if cobj is None or cobj.stream is None:
                continue
            try:
                chunks.append(_decode_stream(cobj, dec))
            except Exception:
                continue  # page degrades to fewer/zero ops, never raises
        out.append(b"".join(chunks))
    if not out:
        raise PdfParseError("no pages")
    return out


# ---------------------------------------------------------------------------
# The predicate itself.
# ---------------------------------------------------------------------------


def count_text_show_ops(content: bytes) -> int:
    """app.py:1265-1278 over an already-decoded stream."""
    if not content:
        return 0
    return len(TEXT_SHOW_OPERATOR_RE.findall(content))


def count_text_chars(content: bytes) -> int:
    """Whitespace-stripped char count of the strings shown by Tj/TJ/'/"
    (the raw-bytes stand-in for pypdf extract_text + re.sub(r'\\s+',''),
    app.py:1202-1223)."""
    total = 0
    i = 0
    n = len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # ( literal string
            s, i = _read_literal_string(content, i)
            total += sum(1 for b in s if b not in _PDF_WHITESPACE)
        elif c == 0x3C and content[i:i + 2] != b"<<":  # <hex>
            end = content.find(b">", i + 1)
            if end < 0:
                break
            hx = re.sub(rb"\s+", b"", content[i + 1:end])
            if len(hx) % 2:
                hx += b"0"
            try:
                s = bytes.fromhex(hx.decode("ascii"))
                total += sum(1 for b in s if b not in _PDF_WHITESPACE)
            except ValueError:
                pass
            i = end + 1
        else:
            i += 1
    return total


_BT_RE = re.compile(rb"(?<![A-Za-z])BT(?![A-Za-z])")
_ET_RE = re.compile(rb"(?<![A-Za-z])ET(?![A-Za-z])")


def extract_text_layer(content: bytes) -> str:
    """Text shown by a page's content stream, in stream order: the operand
    bytes of every Tj/TJ/'/\" (TJ arrays concatenated, kern offsets
    dropped), grouped per BT..ET block and joined with newlines.

    This is the EXTENSION path for searchable PDFs a crawl carries — the
    reference plans such files OUT of OCR instead of extracting them
    (app.py:1306-1352), so there is no reference fixture to match; the
    bytes round-trip exactly through this engine's own writer (q47 proves
    writer → parser → extractor equals a pure-SQL reconstruction).  Glyph
    decoding through font CMaps is out of scope: operand BYTES are decoded
    as UTF-8 (exact for this writer and for simple-font PDFs)."""
    blocks: List[bytes] = []
    cur: List[bytes] = []
    last_string: Optional[bytes] = None
    last_array: Optional[bytes] = None
    in_array = False
    array_strings: List[bytes] = []
    i = 0
    n = len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # ( literal string
            s, i = _read_literal_string(content, i)
            if in_array:
                array_strings.append(s)
            else:
                last_string = s
            continue
        if c == 0x3C and content[i:i + 2] != b"<<":  # <hex>
            end = content.find(b">", i + 1)
            if end < 0:
                break
            hx = re.sub(rb"\s+", b"", content[i + 1:end])
            if len(hx) % 2:
                hx += b"0"
            try:
                s = bytes.fromhex(hx.decode("ascii"))
            except ValueError:
                s = b""
            if in_array:
                array_strings.append(s)
            else:
                last_string = s
            i = end + 1
            continue
        if c == 0x5B:  # [
            in_array = True
            array_strings = []
            i += 1
            continue
        if c == 0x5D:  # ]
            in_array = False
            last_array = b"".join(array_strings)
            i += 1
            continue
        m = TEXT_SHOW_OPERATOR_RE.match(content, i)
        if m:
            if m.group(1) == b"TJ":
                if last_array is not None:
                    cur.append(last_array)
                    last_array = None
            elif last_string is not None:
                cur.append(last_string)
                last_string = None
            i = m.end()
            continue
        if _ET_RE.match(content, i):
            if cur:
                blocks.append(b"".join(cur))
                cur = []
            i += 2
            continue
        i += 1
    if cur:
        blocks.append(b"".join(cur))
    return "\n".join(b.decode("utf-8", errors="replace") for b in blocks)


def has_text_layer_raw(
    data: bytes,
    pages_to_check: int = DEFAULT_TEXT_LAYER_CHECK_PAGES,
    min_chars: int = MIN_TEXT_LAYER_CHARS,
    min_text_ops: int = MIN_TEXT_SHOW_OPS,
) -> Tuple[bool, int]:
    """(has_text, total_pages) over raw PDF bytes — the reference's walk
    (app.py:1191-1248): cumulative chars AND ops, early exit the moment
    either total crosses its threshold, at most
    ``min(total_pages, max(1, pages_to_check))`` pages examined.

    Raises PdfParseError / EncryptedPdfError for file-level failures —
    callers map these to parse-failure action rows."""
    streams = page_content_streams(data)
    total_pages = len(streams)
    check_pages = min(total_pages,
                      max(1, int(pages_to_check
                                 or DEFAULT_TEXT_LAYER_CHECK_PAGES)))
    total_chars = 0
    total_ops = 0
    for i in range(check_pages):
        content = streams[i]
        total_chars += count_text_chars(content)
        total_ops += count_text_show_ops(content)
        if total_chars >= min_chars or total_ops >= min_text_ops:
            return True, total_pages
    return False, total_pages
