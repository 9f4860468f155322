"""Config-driven CSS-selector field extraction (SURVEY.md §2.2 M3,
§2.8 F6-F8) on a stdlib mini-DOM — BeautifulSoup is not available in
this container, so a small html.parser-based DOM supports the selector
subset the reference's configs actually use
(generic_scraper.py:140-231): ``tag``, ``.class``, ``#id``,
``tag.class``, and descendant combination via the container selector.

Extraction rule shape (YAML-compatible, settings.yaml:81-192 keys):

    {"container": "table.prices",
     "fields": {
        "name":  {"selector": "td.name"},
        "price": {"selector": "td.price", "transform": "float"},
        "link":  {"selector": "a", "attribute": "href"},
        "pct":   {"selector": "td.chg", "regex": "([\\d.]+)%"},
     }}

Transforms (F6): float / lowercase / uppercase / strip_currency.
Cleaners (F7) are applied to every text value: whitespace normalize.
Validators (F8): number / url / non_empty via ``validate_value``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urlparse

import pyarrow as pa

from ..functions.cleaning import clean_price_string

_WS = re.compile(r"\s+")


@dataclass
class Node:
    tag: str
    attrs: dict
    children: list = field(default_factory=list)
    text_parts: list = field(default_factory=list)

    @property
    def classes(self) -> set[str]:
        return set((self.attrs.get("class") or "").split())

    def text(self) -> str:
        parts = list(self.text_parts)
        for c in self.children:
            parts.append(c.text())
        return _WS.sub(" ", " ".join(p for p in parts if p)).strip()


class _DomBuilder(HTMLParser):
    VOID = {"br", "img", "hr", "meta", "link", "input"}

    def __init__(self):
        super().__init__()
        self.root = Node("", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in self.VOID:
            self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data.strip():
            self.stack[-1].text_parts.append(data)


def parse_dom(html: str) -> Node:
    b = _DomBuilder()
    b.feed(html or "")
    return b.root


def _match(node: Node, sel: str) -> bool:
    tag, _, rest = sel.partition(".")
    if sel.startswith("#"):
        return node.attrs.get("id") == sel[1:]
    if sel.startswith("."):
        return sel[1:] in node.classes
    if rest:
        return node.tag == tag and rest in node.classes
    return node.tag == sel


def select(node: Node, selector: str) -> list[Node]:
    """Descendant-combinator selector: space-separated simple selectors."""
    parts = selector.split()
    current = [node]
    for part in parts:
        nxt: list[Node] = []

        def walk(n: Node):
            for c in n.children:
                if _match(c, part):
                    nxt.append(c)
                walk(c)

        for n in current:
            walk(n)
        current = nxt
    return current


# F6 transforms (generic_scraper.py:233-246)
_TRANSFORMS = {
    "float": clean_price_string,
    "lowercase": lambda v: str(v).lower(),
    "uppercase": lambda v: str(v).upper(),
    "strip_currency": lambda v: re.sub(r"[$€£¥,]", "", str(v)).strip(),
}


def validate_value(value, kind: str) -> bool:
    """F8 format validators (generic_scraper.py:362-375)."""
    if kind == "non_empty":
        return value is not None and str(value).strip() != ""
    if kind == "number":
        try:
            float(value)
            return True
        except (TypeError, ValueError):
            return False
    if kind == "url":
        try:
            return bool(urlparse(str(value)).netloc)
        except ValueError:
            return False
    return True


def extract_fields(html: str, config: dict) -> list[dict]:
    """M3 — one record per container match; per-field selector +
    optional attribute / regex / transform."""
    dom = parse_dom(html)
    containers = select(dom, config.get("container", "body")) or [dom]
    fields: dict = config.get("fields", {})
    records = []
    for container in containers:
        rec = {}
        for name, rule in fields.items():
            nodes = select(container, rule.get("selector", ""))
            idx = rule.get("index", 0)
            if len(nodes) <= idx:
                rec[name] = None
                continue
            node = nodes[idx]
            value = node.attrs.get(rule["attribute"]) if rule.get("attribute") else node.text()
            if value is not None and rule.get("regex"):
                m = re.search(rule["regex"], str(value))
                value = m.group(1) if (m and m.groups()) else (m.group(0) if m else None)
            if value is not None and rule.get("transform"):
                value = _TRANSFORMS[rule["transform"]](value)
            if rule.get("validate") and not validate_value(value, rule["validate"]):
                value = None
            rec[name] = value
        if any(v is not None for v in rec.values()):
            records.append(rec)
    return records


class CssExtract:
    """map_batches stage: HTML body column → extracted records, config
    captured per actor (selectors parsed once)."""

    def __init__(self, config: dict, body_col: str = "body", url_col: str = "url"):
        self.config = config
        self.body_col = body_col
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in self.config.get("fields", {})}
        out["source_url"] = []
        for body, url in zip(batch[self.body_col].to_pylist(), batch[self.url_col].to_pylist()):
            text = body.decode("utf-8", "replace") if isinstance(body, (bytes, bytearray)) else (body or "")
            for rec in extract_fields(text, self.config):
                for name in self.config.get("fields", {}):
                    out[name].append(rec.get(name))
                out["source_url"].append(url)
        arrays = {}
        for name, values in out.items():
            arrays[name] = pa.array(values)
        return pa.table(arrays)
