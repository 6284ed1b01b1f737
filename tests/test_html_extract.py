"""HTML main-content extraction: frozen-by-this-suite semantics
(the reference has no HTML path; these tests ARE the spec)."""

from __future__ import annotations

from pdf_ocr_batch_ndrocr_lite_spark.functions.html_extract import (
    extract_main_text,
)

SHELL = ("<html><head><script>var x = 'ignore me';</script>"
         "<style>.x{{color:red}}</style></head><body>"
         "<nav><a href='/a'>Home</a> <a href='/b'>About</a></nav>"
         "<div class='side'><a href='/1'>one</a> <a href='/2'>two</a> "
         "<a href='/3'>three</a> <a href='/4'>four</a></div>"
         "{main}"
         "<footer><a href='/p'>Privacy</a></footer>"
         "</body></html>")

CONTENT = ("This is the real article content with plenty of prose. "
           "It goes on for a while and has barely any links at all, "
           "which is what content looks like.")


def test_main_article_wins_over_boilerplate():
    html = SHELL.format(main=f"<article><p>{CONTENT}</p></article>")
    out = extract_main_text(html)
    assert CONTENT in out
    assert "Home" not in out
    assert "Privacy" not in out
    assert "one" not in out


def test_script_style_dropped():
    html = SHELL.format(main=f"<div id='m'><p>{CONTENT}</p></div>")
    out = extract_main_text(html)
    assert "ignore me" not in out
    assert "color:red" not in out


def test_empty_body_yields_empty():
    assert extract_main_text("<html><body></body></html>") == ""
    assert extract_main_text("") == ""
    assert extract_main_text("<html><body><nav><a href='/'>x</a></nav>"
                             "</body></html>") == ""


def test_sibling_sections_both_captured():
    html = SHELL.format(
        main="<main><section><p>first half of the story</p></section>"
             "<section><p>second half of the story</p></section></main>")
    out = extract_main_text(html)
    assert "first half" in out and "second half" in out


def test_block_elements_become_lines():
    html = SHELL.format(
        main="<div id='m'><p>para one is long enough to win the scoring "
             "race</p><p>para two also carries plenty of text along</p>"
             "</div>")
    out = extract_main_text(html)
    lines = out.split("\n")
    assert any("para one" in ln for ln in lines)
    assert any("para two" in ln for ln in lines)
    assert not any("para one" in ln and "para two" in ln for ln in lines)


def test_table_and_pre_content_kept():
    html = SHELL.format(
        main="<div class='c'><p>prose prose prose prose prose prose prose "
             "prose prose prose</p><table><tr><td>cell-a</td><td>cell-b"
             "</td></tr></table><pre>x = 1</pre></div>")
    out = extract_main_text(html)
    assert "cell-a" in out and "x = 1" in out


def test_link_density_penalizes_link_farms():
    linkfarm = " ".join(f"<a href='/{i}'>link text {i} here</a>"
                        for i in range(30))
    html = SHELL.format(
        main=f"<div id='farm'>{linkfarm}</div>"
             f"<div id='real'><p>{CONTENT}</p></div>")
    out = extract_main_text(html)
    assert CONTENT in out
    assert "link text 5" not in out


def test_malformed_html_tolerated():
    html = "<html><body><div><p>unclosed paragraph<div>nested " \
           "wrongly</p></div><p>more text here to score</body>"
    out = extract_main_text(html)
    assert "unclosed paragraph" in out


def test_deterministic():
    html = SHELL.format(main=f"<article><p>{CONTENT}</p></article>")
    assert extract_main_text(html) == extract_main_text(html)
