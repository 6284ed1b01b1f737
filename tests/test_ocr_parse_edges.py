"""Targeted edge tests for the tolerant parser — the behaviors the fixture
generator's distribution may under-sample (reference citations inline)."""

from __future__ import annotations

import json

from pdf_ocr_batch_ndrocr_lite_spark.functions import ocr_parse as P
from pdf_ocr_batch_ndrocr_lite_spark.functions.textops import Token


def _tok_payload(items, name="r.json", fmt="json"):
    return {"format": fmt, "name": name,
            "payload": json.dumps(items, ensure_ascii=False)}


def test_page_hint_zero_and_one_based():
    """0-based in range wins; out-of-0-range but valid 1-based shifts down
    (app.py:4186-4198)."""
    assert P.extract_page_hint({"page": 0}, None, 3) == 0
    assert P.extract_page_hint({"page": 2}, None, 3) == 2
    assert P.extract_page_hint({"page": 3}, None, 3) == 2      # 1-based
    assert P.extract_page_hint({"page_no": 1}, None, 1) == 0   # 1-based only
    assert P.extract_page_hint({"page": 9}, 1, 3) == 1         # inherited
    assert P.extract_page_hint({"page": "x"}, 7, 3) == 7       # non-int


def test_fuzzy_filename_routing():
    """Exact p/page number first; single-page shortcut; fuzzy score
    (app.py:2026-2051, 4129-4141)."""
    assert P.guess_page_index_from_name("page_0003.png.json", 5) == 2
    assert P.guess_page_index_from_name("p0003.xml", 5) == 2
    assert P.guess_page_index_from_name("scan-3.txt", 5) == 2
    assert P.guess_page_index_from_name("whatever.txt", 1) == 0
    assert P.guess_page_index_from_name("nothing-here.txt", 5) is None


def test_minus_one_bucket_routed_by_filename():
    """Tokens with no page hint land in -1 and route to the name-guessed
    page (app.py:1753-1780)."""
    toks = [{"text": "hello", "bbox": [0, 0, 10, 10]}]
    out = _tok_payload({"items": toks}, name="page_0002.json")
    result, stats = P.parse_envelope([out], page_count=3)
    assert [t.text for t in result[1].tokens] == ["hello"]
    assert not result[0].tokens and not result[2].tokens


def test_priority_merge_only_empty_pages():
    """XML fills only pages JSON left empty (app.py:1672-1687)."""
    js = _tok_payload(
        {"results": [{"page": 0, "text": "json0", "bbox": [0, 0, 9, 9]}]},
        name="a.json")
    xml = {"format": "xml", "name": "b.xml", "payload":
           '<OCRDATASET>'
           '<PAGE page="0"><LINE X="0" Y="0" WIDTH="9" HEIGHT="9"'
           ' STRING="xml0"/></PAGE>'
           '<PAGE page="1"><LINE X="0" Y="0" WIDTH="9" HEIGHT="9"'
           ' STRING="xml1"/></PAGE></OCRDATASET>'}
    result, _ = P.parse_envelope([js, xml], page_count=2)
    assert [t.text for t in result[0].tokens] == ["json0"]   # json kept
    assert [t.text for t in result[1].tokens] == ["xml1"]    # xml fills gap


def test_tokens_upgrade_blocks_only_page():
    """A page holding only text_blocks still accepts coordinate tokens from
    a lower-priority format — provided some page is still empty so the
    format even parses (app.py:1672-1674 break, 1759-1763 upgrade)."""
    js = _tok_payload({"pages": [{"page": 0, "content": "block text"}]},
                      name="a.json")
    xml = {"format": "xml", "name": "b.xml", "payload":
           '<X><PAGE page="0"><LINE X="0" Y="0" WIDTH="9" HEIGHT="9"'
           ' STRING="tok"/></PAGE></X>'}
    result, _ = P.parse_envelope([js, xml], page_count=2)
    assert [t.text for t in result[0].tokens] == ["tok"]
    assert result[0].text_blocks == ["block text"]


def test_lower_format_skipped_once_pages_full():
    """Once every page has text, XML/TXT are not parsed at all
    (app.py:1672-1687)."""
    js = _tok_payload({"pages": [{"page": 0, "content": "block text"}]},
                      name="a.json")
    xml = {"format": "xml", "name": "b.xml", "payload":
           '<X><PAGE page="0"><LINE X="0" Y="0" WIDTH="9" HEIGHT="9"'
           ' STRING="tok"/></PAGE></X>'}
    result, _ = P.parse_envelope([js, xml], page_count=1)
    assert result[0].tokens == []
    assert result[0].text_blocks == ["block text"]


def test_txt_formfeed_count_match_and_mismatch():
    """Form-feed zip when counts match; filename routing otherwise
    (app.py:1790-1823)."""
    match = {"format": "txt", "name": "out.txt", "payload": "p0\fp1\fp2"}
    result, _ = P.parse_envelope([match], page_count=3)
    assert [result[i].text_blocks for i in range(3)] == [["p0"], ["p1"], ["p2"]]

    mismatch = {"format": "txt", "name": "page_0002.txt",
                "payload": "a\fb"}  # 2 segments, 3 pages
    result, _ = P.parse_envelope([mismatch], page_count=3)
    # whole text routed to the filename page; postprocess normalization
    # collapses the form feed to a space (app.py:1822, 1730)
    assert result[1].text_blocks == ["a b"]
    assert not result[0].text_blocks and not result[2].text_blocks


def test_txt_skipped_when_pages_full():
    """TXT never parses once every page has text (app.py:1681-1683)."""
    js = _tok_payload(
        {"results": [{"page": 0, "text": "j", "bbox": [0, 0, 9, 9]}]},
        name="a.json")
    txt = {"format": "txt", "name": "z.txt", "payload": "should not appear"}
    result, _ = P.parse_envelope([js, txt], page_count=1)
    assert result[0].text_blocks == []


def test_bbox_variants_all_accepted():
    cases = [
        {"bbox": [1, 2, 3, 4]},
        {"box": {"x": 1, "y": 2, "w": 2, "h": 2}},
        {"rect": [[1, 2], [3, 2], [3, 4], [1, 4]]},
        {"x": 1, "y": 2, "w": 2, "h": 2},
        {"X": 1, "Y": 2, "WIDTH": 2, "HEIGHT": 2},
        {"left": 1, "top": 2, "width": 2, "height": 2},
        {"xmin": 1, "ymin": 2, "xmax": 3, "ymax": 4},
        {"x1": 1, "y1": 2, "x2": 3, "y2": 4},
    ]
    for obj in cases:
        bbox = P.extract_bbox_from_mapping(obj)
        assert bbox is not None, obj
        assert bbox[0] == 1 and bbox[1] == 2
    # degenerate list4 (x2 <= x1) rejected (app.py:4258-4264)
    assert P.extract_bbox_from_mapping({"bbox": [3, 2, 1, 4]}) is None


def test_text_key_priority_order():
    """'text' beats later keys; blank strings skipped (app.py:4145-4165)."""
    assert P.extract_text_from_mapping(
        {"PlainText": "low", "text": "high"}) == "high"
    assert P.extract_text_from_mapping(
        {"text": "  ", "content": "c"}) == "c"
    assert P.extract_text_from_mapping({"other": "x"}) is None


def test_xml_namespaced_page_word():
    """Namespaced PAGE-XML Word/Coords/Unicode parses with points bbox
    (app.py:4296-4328)."""
    ns = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"
    payload = (f'<PcGts xmlns="{ns}"><Page><Word>'
               f'<Coords points="1,2 3,2 3,4 1,4"/>'
               f'<TextEquiv><Unicode>word</Unicode></TextEquiv>'
               f'</Word></Page></PcGts>')
    out = {"format": "xml", "name": "p0001.xml", "payload": payload}
    result, _ = P.parse_envelope([out], page_count=1)
    assert result[0].tokens == [Token("word", 1.0, 2.0, 3.0, 4.0)]


def test_xml_finest_granularity_only():
    """String beats TextLine beats TextRegion — no parent+child double
    extraction (app.py:1965-1981)."""
    payload = ('<alto><TextRegion x1="0" y1="0" x2="99" y2="99">'
               '<TextLine x1="0" y1="0" x2="50" y2="10">'
               '<String CONTENT="w1" X="0" Y="0" WIDTH="5" HEIGHT="9"/>'
               '<String CONTENT="w2" X="9" Y="0" WIDTH="5" HEIGHT="9"/>'
               '</TextLine></TextRegion></alto>')
    out = {"format": "xml", "name": "a.xml", "payload": payload}
    result, _ = P.parse_envelope([out], page_count=1)
    assert sorted(t.text for t in result[0].tokens) == ["w1", "w2"]


def test_parse_warning_counted_not_raised():
    bad = {"format": "json", "name": "bad.json", "payload": "{truncated"}
    result, stats = P.parse_envelope([bad], page_count=1)
    assert stats["parse_warnings"] == 1
    assert not result[0].has_any_text()


def test_low_coverage_flag():
    js = _tok_payload(
        {"results": [{"page": 0, "text": "only", "bbox": [0, 0, 9, 9]}]},
        name="a.json")
    _, stats = P.parse_envelope([js], page_count=5)
    assert stats["low_coverage"] == 1
