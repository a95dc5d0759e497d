"""Custom CSS-selector extraction (H11) + form introspection (H10)."""

from __future__ import annotations

import pytest

from ai4orgwebscraper_spark.operators.selectors import (
    UnsupportedSelector,
    compile_selector,
    extract_custom_fields,
    extract_forms,
    forms_py,
    parse_selector_spec,
    select_py,
)

H = """
<div id="main" class="box outer">
  <p class="lead intro">Hello <b>world</b></p>
  <p>plain</p>
  <section><p class="lead">nested lead</p></section>
  <a href="/x">link</a>
  <form action="/submit" method="POST">
    <input type="text" name="q" id="q" value="seed">
    <select name="s"></select>
  </form>
</div>
<p class="lead">outside</p>
"""


def test_selector_semantics():
    assert select_py(H, "p") == ["Hello world", "plain", "nested lead", "outside"]
    assert select_py(H, ".lead") == ["Hello world", "nested lead", "outside"]
    assert select_py(H, "p.lead") == ["Hello world", "nested lead", "outside"]
    assert select_py(H, "div p") == ["Hello world", "plain", "nested lead"]
    assert select_py(H, "div > p") == ["Hello world", "plain"]
    assert select_py(H, "section > p.lead") == ["nested lead"]
    assert select_py(H, "a[href]") == ["link"]
    assert select_py(H, "input[type=text]") == [""]


def test_unsupported_selector_is_loud():
    # empty/combinator-terminal selectors fail at compile time on the
    # driver, not as IndexError at match time in an executor
    for bad in ("p:nth-child(2)", "p ~ a", "p + p", "p[href^=x]",
                "", "   ", ">", "div >", "div > ", "> p"):
        with pytest.raises(UnsupportedSelector):
            compile_selector(bad)


def test_selector_spec_parse():
    # the reference's "name: selector" line format (app.py:281-284)
    assert parse_selector_spec("t: h1.title\n\nbroken line\np: div > p") == {
        "t": "h1.title",
        "p": "div > p",
    }


def test_forms_py():
    forms = forms_py(H)
    assert len(forms) == 1
    assert forms[0]["action"] == "/submit" and forms[0]["method"] == "post"
    assert forms[0]["fields"][0] == {"type": "text", "name": "q", "id": "q", "value": "seed"}


def test_extract_custom_fields_spark(spark):
    df = spark.createDataFrame([("d1", H), ("d2", "<p class='lead'>x</p>")],
                               "doc_id string, html string")
    out = extract_custom_fields(df, {"leads": ".lead", "links": "a[href]"})
    rows = {(r["doc_id"], r["field"]): r["matches"] for r in out.collect()}
    assert rows[("d1", "custom_leads")] == ["Hello world", "nested lead", "outside"]
    assert rows[("d2", "custom_leads")] == ["x"]
    assert rows[("d1", "custom_links")] == ["link"]
    assert rows[("d2", "custom_links")] == []  # array always, never scalar/missing


def test_extract_custom_fields_rejects_bad_selector_eagerly(spark):
    df = spark.createDataFrame([("d", H)], "doc_id string, html string")
    with pytest.raises(UnsupportedSelector):
        extract_custom_fields(df, {"bad": "p:hover"})


def test_extract_forms_spark(spark):
    df = spark.createDataFrame([("d1", H)], "doc_id string, html string")
    row = extract_forms(df).collect()[0]
    assert row["forms"][0]["action"] == "/submit"
    assert row["forms"][0]["fields"][0]["name"] == "q"
