"""H-series extraction semantics on crafted HTML (SURVEY.md §2.7)."""

from __future__ import annotations

from ai4orgwebscraper_spark.operators.html_parse import parse_html, parse_html_py

DOC = """
<html><head><title>The Title</title>
<meta name="description" content="A test page">
</head><body>
<h1>Top</h1>
<p>First paragraph.</p>
<img src="/img/a.png" alt="logo">
<p>Second <b>bold</b> paragraph.</p>
<p>   </p>
<a href="https://ext.example.com/x">external</a>
<a href="/rel/y">relative</a>
<h2>Section</h2>
<ul><li>one</li><li>two</li><li> </li></ul>
<table><tr><th>A</th><th>B</th></tr><tr><td>1</td><td></td></tr><tr><td> </td></tr></table>
<img src="https://cdn.example.com/b.jpg">
</body></html>
"""


def test_fields_py():
    r = parse_html_py("d1", DOC)
    assert r["title"] == "The Title"
    assert r["meta_description"] == "A test page"
    assert r["headings"] == [
        {"level": "h1", "text": "Top"},
        {"level": "h2", "text": "Section"},
    ]
    assert r["links"] == [
        {"text": "external", "href": "https://ext.example.com/x"},
        {"text": "relative", "href": "/rel/y"},
    ]
    assert r["images"] == [
        {"alt": "logo", "src": "/img/a.png"},
        {"alt": "", "src": "https://cdn.example.com/b.jpg"},
    ]
    # empty cells and empty rows skipped (reference web_scraper_js.py:484-487)
    assert r["tables"] == [[["A", "B"], ["1"]]]
    assert r["list_items"] == ["one", "two"]
    assert all(r[f] for f in ("has_title", "has_links", "has_images", "has_tables", "has_paragraphs"))


def test_spans_document_order_interleaved():
    r = parse_html_py("d1", DOC)
    seq = [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
    assert seq == [
        ("text", "Top", None),
        ("text", "First paragraph.", None),
        ("media_ref", "logo", "/img/a.png"),
        ("text", "Second bold paragraph.", None),  # empty <p> filtered
        ("text", "Section", None),
        ("text", "one", None),
        ("text", "two", None),
        ("text", "A", None),
        ("text", "B", None),
        ("text", "1", None),
        ("media_ref", "", "https://cdn.example.com/b.jpg"),
    ]
    assert [s["offset"] for s in r["spans"]] == list(range(len(seq)))


def test_missing_title_and_malformed():
    r = parse_html_py("d2", "<body><p>only text</p>")
    assert r["title"] == "No Title"  # reference web_scraper.py:42-43
    assert r["has_title"] is False
    r2 = parse_html_py("d3", "<p>a<table><tr><td>x</p></div></table>")
    assert r2["doc_id"] == "d3"  # malformed input never raises


def test_spark_parse_matches_python(spark):
    docs = [("a", DOC), ("b", "<title>T</title><p>x</p>"), ("c", "")]
    df = spark.createDataFrame(docs, "doc_id string, html string")
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in parse_html(df).collect()}
    for doc_id, html in docs:
        want = parse_html_py(doc_id, html)
        got = rows[doc_id]
        assert got["title"] == want["title"]
        assert got["spans"] == want["spans"]
        assert got["links"] == want["links"]
        assert got["tables"] == want["tables"]
