"""HTML field-extraction operators (SURVEY.md §2.7 H1-H12) — the
reference's per-page BeautifulSoup extractor library
(web_scraper_js.py:440-527 extract_field; web_scraper.py:30-44
article extraction) re-expressed as ONE vectorized parse stage.

The reference parses a DOM once and extracts field-by-field on demand
(self.soup cached, web_scraper_js.py:138). Here a single `mapInPandas`
pass materializes every field into typed columns + the interleaved
`spans` payload; each later "extract" is a column-pruned select — the
reference's DOM-reuse optimization becomes free Catalyst pruning
(SURVEY.md §4.1).

Parser: Python stdlib html.parser (BeautifulSoup/lxml are not in this
container; the reference itself uses html.parser on its plain path —
web_scraper.py:31). Semantics pinned by tests/test_html_parse.py on
crafted HTML.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

PARSED_SCHEMA = (
    "doc_id string, title string, meta_description string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "headings array<struct<level:string,text:string>>, "
    "links array<struct<text:string,href:string>>, "
    "images array<struct<alt:string,src:string>>, "
    "tables array<array<array<string>>>, "
    "list_items array<string>, "
    "has_title boolean, has_links boolean, has_images boolean, "
    "has_tables boolean, has_paragraphs boolean"
)

_HEADINGS = ("h1", "h2", "h3")


class _Extractor(HTMLParser):
    """Single-pass document-order extractor with the reference's field
    semantics: title (web_scraper.py:42-43), meta description
    (web_scraper_js.py:460-462), h1-h3 (web_scraper_js.py:464-468),
    links (web_scraper_js.py:470-472), images (web_scraper_js.py:474-476),
    tables skipping empty cells/rows (web_scraper_js.py:478-488),
    paragraphs joined in document order (web_scraper.py:39-41), list
    items (web_scraper_js.py:493-499)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title: str | None = None
        self.meta_description: str | None = None
        self.headings: list[tuple[str, str]] = []
        self.links: list[tuple[str, str]] = []
        self.images: list[tuple[str, str]] = []
        self.tables: list[list[list[str]]] = []
        self.list_items: list[str] = []
        self.spans: list[tuple[str, str | None, str | None, int]] = []
        self._offset = 0
        self._stack: list[str] = []
        self._text_target: list[str] | None = None
        self._cur_link_href: str | None = None
        self._cur_link_text: list[str] = []
        self._cur_table: list[list[str]] | None = None
        self._cur_row: list[str] | None = None
        self._cur_cell: list[str] | None = None

    # --- helpers ---------------------------------------------------------
    def _emit_text_span(self, text: str) -> None:
        text = text.strip()
        if text:  # empty-text filter (reference web_scraper.py:39-41)
            self.spans.append(("text", text, None, self._offset))
            self._offset += 1

    # --- tag events ------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        self._stack.append(tag)
        if tag == "meta" and a.get("name") == "description":
            self.meta_description = a.get("content")
        elif tag == "a" and a.get("href") is not None:
            self._cur_link_href = a["href"]
            self._cur_link_text = []
        elif tag == "img" and a.get("src") is not None:
            alt, src = a.get("alt", ""), a["src"]
            self.images.append((alt, src))
            # media_ref span interleaved at its document position
            self.spans.append(("media_ref", alt, src, self._offset))
            self._offset += 1
        elif tag in ("p", "li", "title") or tag in _HEADINGS:
            self._text_target = []
        elif tag == "table":
            self._cur_table = []
        elif tag == "tr" and self._cur_table is not None:
            self._cur_row = []
        elif tag in ("td", "th") and self._cur_row is not None:
            self._cur_cell = []

    def handle_endtag(self, tag):
        while self._stack and self._stack[-1] != tag:
            self._stack.pop()
        if self._stack:
            self._stack.pop()
        if tag == "title" and self._text_target is not None:
            self.title = "".join(self._text_target).strip()
            self._text_target = None
        elif tag in _HEADINGS and self._text_target is not None:
            text = "".join(self._text_target).strip()
            if text:
                self.headings.append((tag, text))
                self._emit_text_span_raw(text)
            self._text_target = None
        elif tag == "p" and self._text_target is not None:
            self._emit_text_span("".join(self._text_target))
            self._text_target = None
        elif tag == "li" and self._text_target is not None:
            text = "".join(self._text_target).strip()
            if text:
                self.list_items.append(text)
                self._emit_text_span_raw(text)
            self._text_target = None
        elif tag == "a" and self._cur_link_href is not None:
            self.links.append(("".join(self._cur_link_text).strip(), self._cur_link_href))
            self._cur_link_href = None
        elif tag in ("td", "th") and self._cur_cell is not None:
            cell = "".join(self._cur_cell).strip()
            if cell:  # skip empties (reference web_scraper_js.py:484-487)
                self._cur_row.append(cell)
            self._cur_cell = None
        elif tag == "tr" and self._cur_row is not None:
            if self._cur_row:
                self._cur_table.append(self._cur_row)
                for cell in self._cur_row:
                    self._emit_text_span_raw(cell)
            self._cur_row = None
        elif tag == "table" and self._cur_table is not None:
            if self._cur_table:
                self.tables.append(self._cur_table)
            self._cur_table = None

    def _emit_text_span_raw(self, text: str) -> None:
        self.spans.append(("text", text, None, self._offset))
        self._offset += 1

    def handle_data(self, data):
        if self._cur_cell is not None:
            self._cur_cell.append(data)
        elif self._text_target is not None:
            self._text_target.append(data)
        if self._cur_link_href is not None:
            self._cur_link_text.append(data)


def parse_html_py(doc_id: str, html: str) -> dict:
    """Pure-Python single-doc parse (shared by tests and the UDF)."""
    ex = _Extractor()
    try:
        ex.feed(html or "")
        ex.close()
    except Exception:  # malformed HTML -> keep what was extracted
        pass
    return {
        "doc_id": doc_id,
        "title": ex.title if ex.title else "No Title",  # web_scraper.py:42-43
        "meta_description": ex.meta_description,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": o} for (k, t, m, o) in ex.spans
        ],
        "headings": [{"level": lv, "text": t} for (lv, t) in ex.headings],
        "links": [{"text": t, "href": h} for (t, h) in ex.links],
        "images": [{"alt": a, "src": s} for (a, s) in ex.images],
        "tables": ex.tables,
        "list_items": ex.list_items,
        "has_title": ex.title is not None,
        "has_links": bool(ex.links),
        "has_images": bool(ex.images),
        "has_tables": bool(ex.tables),
        "has_paragraphs": any(k == "text" for (k, *_r) in ex.spans),
    }


def parse_html(df: DataFrame, id_col: str = "doc_id", html_col: str = "html") -> DataFrame:
    """Vectorized parse stage: (doc_id, html) -> full field table.

    Scale: one Arrow round-trip parses every field at once; downstream
    single-field extracts are column-pruned scans of the materialized
    result (never a re-parse)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                [parse_html_py(i, h) for i, h in zip(pdf[id_col], pdf[html_col])]
            )

    return df.mapInPandas(run, schema=PARSED_SCHEMA)
