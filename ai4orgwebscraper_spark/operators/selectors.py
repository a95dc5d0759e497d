"""Custom CSS-selector extraction (SURVEY.md H11) + form introspection
(SURVEY.md H10).

The reference lets users type ``name: selector`` lines and runs
``soup.select(selector)`` per field (reference app.py:281-284,
web_scraper_js.py:447-454, keys prefixed ``custom_``
web_scraper_js.py:536-541). This module provides the same capability
without BeautifulSoup: a lightweight element tree built on the stdlib
HTMLParser plus a matcher for the selector subset that covers the
reference's documented usage:

    tag        .class        #id        tag.class      tag#id
    ancestor-descendant combination with spaces (``div p``)
    child combinator (``div > p``)
    attribute presence/equality (``a[href]``, ``input[type=text]``)

Unsupported syntax raises ``UnsupportedSelector`` loudly (never a
silent wrong answer). The scalar-vs-list collapse of the reference
(single match -> scalar, web_scraper_js.py:452-454) becomes "array
always" — fixed schema (SURVEY.md H11 note).

``extract_custom_fields`` is the vectorized stage: (doc_id, html) x
{name: selector} -> (doc_id, field, matches array<string>).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from dataclasses import dataclass, field
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class UnsupportedSelector(ValueError):
    pass


@dataclass
class Node:
    tag: str
    attrs: dict[str, str]
    parent: "Node | None" = None
    children: list["Node"] = field(default_factory=list)
    text_parts: list[str] = field(default_factory=list)

    def text(self) -> str:
        parts = ["".join(self.text_parts)]
        for c in self.children:
            parts.append(c.text())
        return "".join(parts)

    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def walk(self) -> Iterator["Node"]:
        yield self
        for c in self.children:
            yield from c.walk()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {})
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), parent=self.cur)
        self.cur.children.append(node)
        if tag not in VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), parent=self.cur))

    def handle_endtag(self, tag):
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is not self.root:
            self.cur = node.parent

    def handle_data(self, data):
        self.cur.text_parts.append(data)


def build_tree(html: str) -> Node:
    b = _TreeBuilder()
    try:
        b.feed(html or "")
        b.close()
    except Exception:
        pass  # malformed input: keep the partial tree
    return b.root


# --- selector compilation ---------------------------------------------------

_SIMPLE = re.compile(
    r"^(?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)?"
    r"(?P<id>#[\w-]+)?"
    r"(?P<cls>(?:\.[\w-]+)+)?"
    r"(?P<attr>\[[\w-]+(?:=[^\]]*)?\])?$"
)


def _compile_simple(part: str):
    m = _SIMPLE.match(part)
    if not m or not part:
        raise UnsupportedSelector(f"unsupported selector fragment {part!r}")
    tag = m.group("tag")
    want_id = m.group("id")[1:] if m.group("id") else None
    classes = set(m.group("cls").replace(".", " ").split()) if m.group("cls") else set()
    attr_name = attr_val = None
    if m.group("attr"):
        inner = m.group("attr")[1:-1]
        if "=" in inner:
            attr_name, attr_val = inner.split("=", 1)
            attr_val = attr_val.strip("'\"")
        else:
            attr_name = inner

    def match(n: Node) -> bool:
        if tag and tag != "*" and n.tag != tag.lower():
            return False
        if want_id and n.attrs.get("id") != want_id:
            return False
        if classes and not classes <= n.classes():
            return False
        if attr_name is not None:
            if attr_name not in n.attrs:
                return False
            if attr_val is not None and n.attrs.get(attr_name) != attr_val:
                return False
        return True

    return match


def compile_selector(selector: str):
    """Compile a selector into a Node predicate over ancestry."""
    # tokenize into (combinator, simple) pairs, preserving '>' vs ' '
    tokens: list[tuple[str, str]] = []
    pieces = re.split(r"(\s*>\s*|\s+)", selector.strip())
    comb = " "
    for piece in pieces:
        if not piece:
            continue
        if piece.strip() == ">":
            comb = ">"
            continue
        if piece.strip() == "":
            if comb != ">":
                comb = " "
            continue
        tokens.append((comb, piece.strip()))
        comb = " "
    # a selector with no simple parts ('', '>') or one ending in a
    # combinator ('div >') must fail HERE, at compile time on the
    # driver — not as an IndexError inside an executor at match time
    # (ADVICE r01)
    if not tokens:
        raise UnsupportedSelector(f"selector has no simple parts: {selector!r}")
    if comb == ">":
        raise UnsupportedSelector(f"selector ends with a combinator: {selector!r}")
    if tokens[0][0] == ">":
        # '> p' has no left operand; silently matching like bare 'p'
        # would be a wrong answer, not a missing feature
        raise UnsupportedSelector(f"selector starts with a combinator: {selector!r}")
    matchers = [(c, _compile_simple(p)) for c, p in tokens]

    def matches(n: Node) -> bool:
        # last simple must match n; walk ancestors for the rest
        idx = len(matchers) - 1
        if not matchers[idx][1](n):
            return False
        node = n
        while idx > 0:
            comb = matchers[idx][0]
            idx -= 1
            pred = matchers[idx][1]
            if comb == ">":
                node = node.parent
                if node is None or not pred(node):
                    return False
            else:
                node = node.parent
                while node is not None and not pred(node):
                    node = node.parent
                if node is None:
                    return False
        return True

    return matches


def select_py(html: str, selector: str) -> list[str]:
    """Document-order text of nodes matching the selector."""
    pred = compile_selector(selector)
    tree = build_tree(html)
    out = []
    for n in tree.walk():
        if n is not tree and pred(n):
            out.append(n.text().strip())
    return out


def parse_selector_spec(spec: str) -> dict[str, str]:
    """Parse the reference's ``name: selector`` line format
    (app.py:281-284): one field per line, first colon splits."""
    out: dict[str, str] = {}
    for line in spec.splitlines():
        line = line.strip()
        if not line or ":" not in line:
            continue
        name, sel = line.split(":", 1)
        if name.strip() and sel.strip():
            out[name.strip()] = sel.strip()
    return out


def forms_py(html: str) -> list[dict]:
    """Form introspection (SURVEY.md H10, web_scraper_js.py:501-525):
    action/method + field list (type, name, id, value)."""
    tree = build_tree(html)
    forms = []
    for n in tree.walk():
        if n.tag != "form":
            continue
        fields = []
        for f in n.walk():
            if f.tag in ("input", "select", "textarea"):
                fields.append(
                    {
                        "type": f.attrs.get("type", f.tag),
                        "name": f.attrs.get("name"),
                        "id": f.attrs.get("id"),
                        "value": f.attrs.get("value"),
                    }
                )
        forms.append(
            {
                "action": n.attrs.get("action"),
                "method": (n.attrs.get("method") or "get").lower(),
                "fields": fields,
            }
        )
    return forms


CUSTOM_SCHEMA = "doc_id string, field string, matches array<string>"
FORMS_SCHEMA = (
    "doc_id string, forms array<struct<action:string,method:string,"
    "fields:array<struct<type:string,name:string,id:string,value:string>>>>"
)


def extract_custom_fields(
    df: DataFrame, selectors: dict[str, str], id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Vectorized custom extraction: one row per (doc, field) with the
    matched texts in document order (keys get the reference's
    ``custom_`` prefix, web_scraper_js.py:536-541)."""
    compiled = {f"custom_{name}": sel for name, sel in selectors.items()}
    for sel in compiled.values():
        compile_selector(sel)  # fail fast on unsupported syntax

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                tree = build_tree(html)
                nodes = [n for n in tree.walk() if n is not tree]
                for fname, sel in compiled.items():
                    pred = compile_selector(sel)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "field": fname,
                            "matches": [n.text().strip() for n in nodes if pred(n)],
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "field", "matches"])

    return df.mapInPandas(run, schema=CUSTOM_SCHEMA)


def extract_forms(df: DataFrame, id_col: str = "doc_id", html_col: str = "html") -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "forms": [forms_py(h) for h in pdf[html_col]],
                }
            )

    return df.mapInPandas(run, schema=FORMS_SCHEMA)
