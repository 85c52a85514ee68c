"""HTML main-content extraction kernel (pure Python, per document).

Re-implements from scratch the DOM-heuristic block-classification family
the reference delegates to readability/goose3 plus its own heuristics:

  - text density per node          (reference html_utils.py:163-164)
  - link-only / link-density drop  (reference extract_html.py:101-155)
  - content list extraction        (reference extract_html.py:158-183)
  - html table extraction          (reference extract_html.py:45-64)
  - pdf link / media harvest       (reference html_utils.py:112-118)
  - text blocks in DOM order       (reference html_utils.py:90-94)

This function runs per document INSIDE an Arrow-batched pandas UDF —
the Spark-level contract (no per-row Python at the DataFrame level)
is satisfied by `mapInPandas` batching (SURVEY.md §2 legend).

Uses only the stdlib `html.parser` (no bs4/lxml in the sandbox).
"""

from __future__ import annotations

from html import unescape
from html.parser import HTMLParser

from ..constants import (
    HTML_BLOCK_TAGS,
    HTML_BOILERPLATE_TAGS,
    HTML_HEADER_TAGS,
    HTML_LINK_DENSITY_MAX,
    HTML_LINKISH_TAGS,
    KIND_HEADER,
    KIND_IMAGE,
    KIND_LIST,
    KIND_MEDIA,
    KIND_TABLE,
    KIND_TEXT,
)
from .spantext import list_to_text, norm_ws, table_to_text

_VOID_TAGS = frozenset(
    {"img", "br", "hr", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "depth")

    def __init__(self, tag: str, attrs: dict, parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # _Node | str
        self.parent = parent
        self.depth = 0 if parent is None else parent.depth + 1


class _TreeBuilder(HTMLParser):
    """Minimal forgiving DOM builder on stdlib HTMLParser."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {}, None)
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        node = _Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        tag = tag.lower()
        self._stack[-1].children.append(_Node(tag, dict(attrs), self._stack[-1]))

    def handle_endtag(self, tag):
        tag = tag.lower()
        # forgiving close: pop to nearest matching open tag
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html(raw: str) -> _Node:
    b = _TreeBuilder()
    b.feed(raw)
    b.close()
    return b.root


def _subtree_text(node: _Node) -> str:
    out: list[str] = []
    stack = [node]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            out.append(n)
        else:
            stack.extend(reversed(n.children))
    return "".join(out)


def _link_text_len(node: _Node, in_link: bool = False) -> int:
    """Total characters of text under link-ish tags (link-density feature,
    re-expressing is_link_only semantics, reference extract_html.py:101-146)."""
    total = 0
    for c in node.children:
        if isinstance(c, str):
            if in_link:
                total += len(norm_ws(c))
        else:
            total += _link_text_len(c, in_link or c.tag in HTML_LINKISH_TAGS)
    return total


def block_features(node: _Node) -> dict:
    """Per-block classification features: text length, link text length,
    link density, tag depth, text density (text vs markup chars)."""
    text = norm_ws(_subtree_text(node))
    tlen = len(text)
    llen = _link_text_len(node)
    return {
        "text": text,
        "text_len": tlen,
        "link_len": llen,
        "link_density": (llen / tlen) if tlen else 1.0,
        "depth": node.depth,
    }


def _is_boilerplate_block(node: _Node) -> bool:
    f = block_features(node)
    if f["text_len"] == 0:
        return True
    return f["link_density"] >= HTML_LINK_DENSITY_MAX


def _table_rows(table: _Node) -> list[list[str]]:
    rows: list[list[str]] = []

    def walk(n: _Node):
        for c in n.children:
            if isinstance(c, str):
                continue
            if c.tag == "tr":
                cells = [
                    norm_ws(_subtree_text(cc))
                    for cc in c.children
                    if not isinstance(cc, str) and cc.tag in ("td", "th")
                ]
                if cells:
                    rows.append(cells)
            else:
                walk(c)

    walk(table)
    return rows


def _list_items(ul: _Node) -> list[str]:
    items = []
    for c in ul.children:
        if not isinstance(c, str) and c.tag == "li":
            t = norm_ws(_subtree_text(c))
            if t:
                items.append(t)
    return items


def extract_html_spans(raw_html: str) -> list[tuple[str, str | None, str | None]]:
    """HTML → ordered list of (kind, text, media_ref) output spans.

    DOM-order walk; boilerplate subtrees dropped by tag class; text/list
    blocks dropped by link density; headers, tables, lists, images and pdf
    links emitted as typed spans.  Offsets are assigned by the caller.
    """
    root = parse_html(unescape_if_needed(raw_html))
    spans: list[tuple[str, str | None, str | None]] = []

    def walk(node: _Node) -> None:
        for c in node.children:
            if isinstance(c, str):
                continue
            tag = c.tag
            if tag in HTML_BOILERPLATE_TAGS:
                continue  # tag-class boilerplate: drop whole subtree
            if tag in HTML_HEADER_TAGS:
                t = norm_ws(_subtree_text(c))
                if t:
                    spans.append((KIND_HEADER, t, None))
                continue
            if tag == "table":
                rows = _table_rows(c)
                if rows:
                    spans.append((KIND_TABLE, table_to_text(rows), None))
                continue
            if tag in ("ul", "ol"):
                if not _is_boilerplate_block(c):
                    items = _list_items(c)
                    if items:
                        spans.append((KIND_LIST, list_to_text(items), None))
                continue
            if tag == "img":
                src = c.attrs.get("src")
                if src:
                    spans.append((KIND_IMAGE, None, src))
                continue
            if tag == "a":
                href = c.attrs.get("href", "")
                if href.lower().endswith(".pdf"):
                    spans.append((KIND_MEDIA, None, href))
                # link text itself is navigation -> not a text block
                continue
            if tag in ("p", "blockquote", "pre"):
                f = block_features(c)
                if f["text_len"] > 0 and f["link_density"] < HTML_LINK_DENSITY_MAX:
                    spans.append((KIND_TEXT, f["text"], None))
                # still emit any media nested in the paragraph
                walk_media_only(c)
                continue
            # container tags: recurse
            walk(c)

    def walk_media_only(node: _Node) -> None:
        for c in node.children:
            if isinstance(c, str):
                continue
            if c.tag == "img":
                src = c.attrs.get("src")
                if src:
                    spans.append((KIND_IMAGE, None, src))
            elif c.tag == "a":
                href = c.attrs.get("href", "")
                if href.lower().endswith(".pdf"):
                    spans.append((KIND_MEDIA, None, href))
            else:
                walk_media_only(c)

    walk(root)
    return spans


def unescape_if_needed(raw: str) -> str:
    """Reference unescapes once when the payload looks double-escaped
    (extract_html.py umbrella step)."""
    if "&lt;" in raw[:200] and "<" not in raw[:200]:
        return unescape(raw)
    return raw


def extract_title(raw_html: str) -> str | None:
    root = parse_html(raw_html)
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, _Node):
            if n.tag == "title":
                t = norm_ws(_subtree_text(n))
                return t or None
            stack.extend(c for c in n.children if isinstance(c, _Node))
    return None


_TITLE_SEP = None  # compiled lazily


def extract_html_meta(raw_html: str, url: str | None = None) -> dict:
    """Document-level metadata outputs of the reference's HtmlExtractor
    (extract_html.py:244-259: title, short_title, html_keywords,
    summary/meta-description, language, canonical/final urls) without
    the readability/goose3 dependencies:

      title        <title> text
      short_title  first segment of the title split on common site
                   separators (" | ", " - ", " : ", …) — deterministic
                   stand-in for readability's shortened title
      keywords     <meta name=keywords> comma-split, normalized, sorted
      description  <meta name=description>
      language     <html lang> else <meta http-equiv=content-language>
      canonical_url <link rel=canonical href>, else the given url
    """
    import re as _re

    global _TITLE_SEP
    if _TITLE_SEP is None:
        _TITLE_SEP = _re.compile(r"\s+[|\-–—:·]\s+")

    root = parse_html(unescape_if_needed(raw_html))
    title = None
    metas: dict[str, str] = {}
    lang = None
    canonical = None
    stack = [root]
    while stack:
        n = stack.pop()
        if not isinstance(n, _Node):
            continue
        if n.tag == "html" and lang is None:
            lang = n.attrs.get("lang")
        elif n.tag == "title" and title is None:
            title = norm_ws(_subtree_text(n)) or None
        elif n.tag == "meta":
            name = (n.attrs.get("name") or n.attrs.get("http-equiv") or "").lower()
            if name and "content" in n.attrs:
                metas.setdefault(name, n.attrs["content"])
        elif n.tag == "link" and (n.attrs.get("rel") or "").lower() == "canonical":
            canonical = canonical or n.attrs.get("href")
        stack.extend(c for c in reversed(n.children) if isinstance(c, _Node))

    short_title = None
    if title:
        segs = _TITLE_SEP.split(title)
        short_title = segs[0] if len(segs) > 1 and segs[0] else title
    keywords = sorted(
        {norm_ws(k) for k in (metas.get("keywords") or "").split(",") if norm_ws(k)}
    )
    return {
        "title": title,
        "short_title": short_title,
        "keywords": keywords,
        "description": metas.get("description"),
        "language": lang or metas.get("content-language"),
        "canonical_url": canonical or url,
    }


def extract_jsonld(raw_html: str) -> list[str]:
    """schema.org metadata: contents of <script type="application/ld+json">
    blocks, validated as JSON — the reference's extruct json-ld path
    (extract_html.py:186-190) without the extruct dependency.  Returns
    the raw JSON strings (typed parsing is the caller's concern)."""
    import json as _json

    root = parse_html(raw_html)
    out: list[str] = []
    stack = [root]
    while stack:
        n = stack.pop()
        if isinstance(n, _Node):
            if (n.tag == "script"
                    and n.attrs.get("type", "").lower() == "application/ld+json"):
                payload = _subtree_text(n).strip()
                try:
                    _json.loads(payload)
                    out.append(payload)
                except ValueError:
                    pass
            stack.extend(c for c in reversed(n.children) if isinstance(c, _Node))
    return out


def _microdata_item(node: _Node) -> dict:
    """One itemscope subtree -> {type, properties} (W3C microdata model;
    nested itemscopes become nested items)."""
    item = {"type": node.attrs.get("itemtype"), "properties": {}}

    def prop_value(n: _Node):
        if "itemscope" in n.attrs:
            return _microdata_item(n)
        if n.tag == "meta":
            return n.attrs.get("content", "")
        if n.tag in ("a", "link", "area"):
            return n.attrs.get("href", "")
        if n.tag in ("img", "audio", "video", "source", "embed", "iframe"):
            return n.attrs.get("src", "")
        if n.tag == "time":
            return n.attrs.get("datetime") or norm_ws(_subtree_text(n))
        return norm_ws(_subtree_text(n))

    def walk(n: _Node):
        for c in n.children:
            if isinstance(c, str):
                continue
            if "itemprop" in c.attrs:
                item["properties"].setdefault(c.attrs["itemprop"], prop_value(c))
            if "itemscope" not in c.attrs:  # nested scopes own their props
                walk(c)

    walk(node)
    return item


def extract_schema(raw_html: str) -> dict:
    """All three structured-metadata syntaxes the reference's extruct
    call covers (extract_html.py:186-190) — json-ld, microdata, and
    opengraph — from the stdlib DOM:

      {"json-ld": [raw json strings],
       "microdata": [{type, properties}],
       "opengraph": {og:* property: content}}
    """
    root = parse_html(raw_html)
    microdata: list[dict] = []
    opengraph: dict[str, str] = {}
    stack = [root]
    while stack:
        n = stack.pop()
        if not isinstance(n, _Node):
            continue
        if "itemscope" in n.attrs and "itemprop" not in n.attrs:
            microdata.append(_microdata_item(n))
        if n.tag == "meta":
            prop = (n.attrs.get("property") or "").lower()
            if prop.startswith("og:") and "content" in n.attrs:
                opengraph.setdefault(prop, n.attrs["content"])
        stack.extend(c for c in reversed(n.children) if isinstance(c, _Node))
    return {
        "json-ld": extract_jsonld(raw_html),
        "microdata": microdata,
        "opengraph": opengraph,
    }
