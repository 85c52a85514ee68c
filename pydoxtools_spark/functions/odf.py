"""From-scratch ODT (OpenDocument Text) and EPUB readers/writers.

The reference routes both through pandoc (extract_pandoc.py:98-167);
pandoc is absent here, so — same strategy as functions/docx.py — the
container formats are parsed directly from public-spec knowledge:

  ODT   (OASIS OpenDocument): zip with `content.xml`; body blocks are
        text:h (header), text:p (paragraph, may carry draw:image),
        text:list (list-items), table:table — mapped to the SAME span
        kinds and canonical text forms as the markdown/docx branches.
  EPUB  (IDPF/W3C): zip with META-INF/container.xml -> OPF package ->
        spine of XHTML chapters.  Chapters are handed to the EXISTING
        html kernel (functions/htmlparse.extract_html_spans) in spine
        order — an epub IS html in a zip, so the html branch's span
        semantics apply verbatim.

Writers emit deterministic bytes (fixed zip timestamps, ZIP_STORED)
for fixtures and driver oracles.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from ..constants import (
    KIND_HEADER,
    KIND_IMAGE,
    KIND_LIST,
    KIND_TABLE,
    KIND_TEXT,
)
from .spantext import list_to_text, norm_ws, table_to_text

OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
TEXTNS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
TABLENS = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
DRAWNS = "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
XLINK = "http://www.w3.org/1999/xlink"
CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
OPF_NS = "http://www.idpf.org/2007/opf"


class OdfParseError(ValueError):
    pass


class EpubParseError(ValueError):
    pass


def _zip_names(data: bytes) -> set[str] | None:
    if data[:4] != b"PK\x03\x04":
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            return set(z.namelist())
    except (zipfile.BadZipFile, OSError):
        return None


def is_odt(data: bytes) -> bool:
    """Dispatch probe: zip magic + content.xml, minus the docx marker
    (an OOXML zip also carries xml parts, so the positive docx probe
    must lose)."""
    names = _zip_names(data)
    return (names is not None and "content.xml" in names
            and "word/document.xml" not in names)


def is_epub(data: bytes) -> bool:
    names = _zip_names(data)
    return names is not None and "META-INF/container.xml" in names


# ------------------------------------------------------------------ ODT


def _odt_text(el) -> str:
    """Text content incl. nested spans; text:tab / text:line-break /
    text:s become spaces (norm_ws collapses them anyway)."""
    parts: list[str] = []

    def walk(node):
        if node.text:
            parts.append(node.text)
        for ch in node:
            tag = ch.tag
            if tag in (f"{{{TEXTNS}}}tab", f"{{{TEXTNS}}}line-break",
                       f"{{{TEXTNS}}}s"):
                parts.append(" ")
            walk(ch)
            if ch.tail:
                parts.append(ch.tail)

    walk(el)
    return "".join(parts)


def extract_odt_spans(data: bytes) -> list[tuple[str, str | None, str | None]]:
    """ODT bytes -> ordered (kind, text, media_ref) spans — the same
    block mapping the docx/markdown branches pin."""
    if not is_odt(data):
        raise OdfParseError("not an odt (zip/content.xml probe)")
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        try:
            content = z.read("content.xml")
        except KeyError as e:
            raise OdfParseError(f"missing part: {e}") from None
    try:
        root = ET.fromstring(content)
    except ET.ParseError as e:
        raise OdfParseError(f"bad content.xml: {e}") from None
    body = root.find(f"{{{OFFICE}}}body/{{{OFFICE}}}text")
    if body is None:
        raise OdfParseError("content.xml without office:body/office:text")

    spans: list[tuple[str, str | None, str | None]] = []
    for el in body:
        tag = el.tag
        if tag == f"{{{TEXTNS}}}h":
            t = norm_ws(_odt_text(el))
            if t:
                spans.append((KIND_HEADER, t, None))
        elif tag == f"{{{TEXTNS}}}p":
            img = el.find(f".//{{{DRAWNS}}}image")
            if img is not None:
                ref = img.get(f"{{{XLINK}}}href")
                spans.append((KIND_IMAGE, None, ref))
                continue
            t = norm_ws(_odt_text(el))
            if t:
                spans.append((KIND_TEXT, t, None))
        elif tag == f"{{{TEXTNS}}}list":
            items = [norm_ws(_odt_text(li))
                     for li in el.findall(f"{{{TEXTNS}}}list-item")]
            items = [i for i in items if i]
            if items:
                spans.append((KIND_LIST, list_to_text(items), None))
        elif tag == f"{{{TABLENS}}}table":
            grid = []
            for tr in el.findall(f"{{{TABLENS}}}table-row"):
                grid.append([norm_ws(_odt_text(tc))
                             for tc in tr.findall(f"{{{TABLENS}}}table-cell")])
            if grid:
                spans.append((KIND_TABLE, table_to_text(grid), None))
    return spans


_XML_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _xesc(s: str) -> str:
    return re.sub(r"[&<>\"]", lambda m: _XML_ESC[m.group(0)], s)


def build_tiny_odt(blocks: list[tuple]) -> bytes:
    """Same block forms as functions/docx.build_tiny_docx ->
    deterministic ODT bytes."""
    body: list[str] = []
    payloads: dict[str, bytes] = {}
    for blk in blocks:
        kind = blk[0]
        if kind == "header":
            body.append(f'<text:h text:outline-level="{blk[2]}">'
                        f"{_xesc(blk[1])}</text:h>")
        elif kind == "text":
            body.append(f"<text:p>{_xesc(blk[1])}</text:p>")
        elif kind == "list":
            items = "".join(
                f"<text:list-item><text:p>{_xesc(i)}</text:p></text:list-item>"
                for i in blk[1])
            body.append(f"<text:list>{items}</text:list>")
        elif kind == "table":
            rows = "".join(
                "<table:table-row>" + "".join(
                    f"<table:table-cell><text:p>{_xesc(c)}</text:p>"
                    "</table:table-cell>" for c in row)
                + "</table:table-row>"
                for row in blk[1])
            body.append(f"<table:table>{rows}</table:table>")
        elif kind == "image":
            if len(blk) > 2:
                payloads[blk[1]] = blk[2]  # real bytes at the target
            body.append(
                '<text:p><draw:frame><draw:image '
                f'xlink:href="{blk[1]}"/></draw:frame></text:p>')
        else:
            raise ValueError(f"unknown block kind: {kind}")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{OFFICE}" '
        f'xmlns:text="{TEXTNS}" xmlns:table="{TABLENS}" '
        f'xmlns:draw="{DRAWNS}" xmlns:xlink="{XLINK}">'
        f"<office:body><office:text>{''.join(body)}</office:text>"
        "</office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, payload in [
            ("mimetype", "application/vnd.oasis.opendocument.text"),
            ("content.xml", content),
        ] + sorted(payloads.items()):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, payload)
    return buf.getvalue()


# ------------------------------------------------------------------ EPUB


def extract_epub_spans(data: bytes) -> list[tuple[str, str | None, str | None]]:
    """EPUB bytes -> ordered spans: container.xml -> OPF -> spine order
    -> each XHTML chapter through the html kernel."""
    from .htmlparse import extract_html_spans

    if not is_epub(data):
        raise EpubParseError("not an epub (container.xml probe)")
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        try:
            container = ET.fromstring(z.read("META-INF/container.xml"))
        except (KeyError, ET.ParseError) as e:
            raise EpubParseError(f"bad container.xml: {e}") from None
        rootfile = container.find(
            f".//{{{CONTAINER_NS}}}rootfile")
        if rootfile is None:
            raise EpubParseError("container.xml without rootfile")
        opf_path = rootfile.get("full-path")
        try:
            opf = ET.fromstring(z.read(opf_path))
        except (KeyError, ET.ParseError) as e:
            raise EpubParseError(f"bad OPF package: {e}") from None
        base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
        items = {
            it.get("id"): it.get("href")
            for it in opf.iter(f"{{{OPF_NS}}}item")
        }
        spans: list[tuple[str, str | None, str | None]] = []
        for ref in opf.iter(f"{{{OPF_NS}}}itemref"):
            href = items.get(ref.get("idref"))
            if href is None:
                raise EpubParseError(f"spine idref {ref.get('idref')!r} "
                                     "not in manifest")
            try:
                chapter = z.read(base + href).decode("utf-8", "replace")
            except KeyError as e:
                raise EpubParseError(f"missing chapter: {e}") from None
            spans.extend(extract_html_spans(chapter))
    return spans


def build_tiny_epub(chapters: list[str]) -> bytes:
    """chapters: XHTML strings -> deterministic EPUB bytes (one spine
    item per chapter, in order)."""
    manifest = "".join(
        f'<item id="c{i}" href="c{i}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for i in range(len(chapters)))
    spine = "".join(f'<itemref idref="c{i}"/>' for i in range(len(chapters)))
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{OPF_NS}" version="3.0" unique-identifier="id">'
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    container = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<container xmlns="{CONTAINER_NS}" version="1.0"><rootfiles>'
        '<rootfile full-path="OEBPS/package.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        entries = [
            ("mimetype", "application/epub+zip"),
            ("META-INF/container.xml", container),
            ("OEBPS/package.opf", opf),
        ] + [(f"OEBPS/c{i}.xhtml", ch) for i, ch in enumerate(chapters)]
        for name, payload in entries:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, payload)
    return buf.getvalue()
