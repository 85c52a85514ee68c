"""From-scratch OOXML (docx) reader/writer pair.

The reference converts docx (and odt/rtf/epub) through pandoc
(extract_pandoc.py:98-167: PandocConverter -> Block list ->
paragraphs/headers/lists/tables) — pandoc is not in this sandbox, so
this module parses the OOXML directly from public ECMA-376 knowledge:
a .docx is a zip; `word/document.xml` holds the body as an ordered
stream of w:p (paragraph) and w:tbl (table) elements; paragraph style
`Heading*` marks headers; w:numPr marks list paragraphs; a:blip
r:embed references images through `word/_rels/document.xml.rels`.

Block -> span mapping mirrors the markdown branch exactly (same
KIND_*, same list_to_text/table_to_text/norm_ws canonical forms), so
a docx and a markdown rendering of the same content produce identical
span streams — the property the pipeline tests pin.

  writer  build_tiny_docx(blocks)   deterministic bytes (fixed zip
                                    timestamps, ZIP_STORED) for
                                    fixtures and driver oracles
  reader  extract_docx_spans(data)  -> ordered (kind, text, media_ref)
          is_docx(data)             PK magic + [Content_Types].xml probe
                                    (the dispatch rule)
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

W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
A = "http://schemas.openxmlformats.org/drawingml/2006/main"
R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
REL = "http://schemas.openxmlformats.org/package/2006/relationships"


class DocxParseError(ValueError):
    pass


def is_docx(data: bytes) -> bool:
    """Dispatch probe: zip magic + [Content_Types].xml with the
    wordprocessingml main-document content type (cheap: central
    directory read only)."""
    if not data[:4] == b"PK\x03\x04":
        return False
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            names = set(z.namelist())
            if "[Content_Types].xml" not in names:
                return False
            return "word/document.xml" in names
    except (zipfile.BadZipFile, OSError):
        return False


# ------------------------------------------------------------------ reader


def _runs_text(el) -> str:
    """Concatenate the element's text runs in document order: w:t text,
    w:tab as space, w:br as space."""
    parts: list[str] = []
    for node in el.iter():
        tag = node.tag
        if tag == f"{{{W}}}t":
            parts.append(node.text or "")
        elif tag in (f"{{{W}}}tab", f"{{{W}}}br", f"{{{W}}}cr"):
            parts.append(" ")
    return "".join(parts)


def _para_style(p) -> str | None:
    st = p.find(f"{{{W}}}pPr/{{{W}}}pStyle")
    return st.get(f"{{{W}}}val") if st is not None else None


def _list_num_id(p) -> str | None:
    """The paragraph's list id (w:numPr/w:numId val), or None for
    non-list paragraphs.  Adjacent paragraphs sharing a numId belong
    to ONE list; a numId change starts a new list (the OOXML/pandoc
    convention — found by the cross-format property test: odt keeps
    adjacent text:list elements separate, so docx must split on numId
    to agree)."""
    npr = p.find(f"{{{W}}}pPr/{{{W}}}numPr")
    if npr is None:
        return None
    nid = npr.find(f"{{{W}}}numId")
    return (nid.get(f"{{{W}}}val") if nid is not None else "") or ""


def _para_image_ref(p, rels: dict[str, str]) -> str | None:
    blip = p.find(f".//{{{A}}}blip")
    if blip is None:
        return None
    rid = blip.get(f"{{{R}}}embed")
    return rels.get(rid) if rid else None


def extract_docx_spans(data: bytes) -> list[tuple[str, str | None, str | None]]:
    """docx bytes -> ordered (kind, text, media_ref) spans.

    Block mapping (the reference's pandoc Block list,
    extract_pandoc.py:122-167): Heading* style -> header; consecutive
    w:numPr paragraphs -> ONE list span (pandoc emits one BulletList);
    w:tbl -> table span in the canonical ' | '/newline form; a:blip
    image reference -> image span (media_ref = rels target); other
    paragraphs -> text spans, whitespace-normalized, empties dropped.
    """
    if not is_docx(data):
        raise DocxParseError("not a docx (PK magic / [Content_Types] probe)")
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        try:
            doc_xml = z.read("word/document.xml")
        except KeyError as e:
            raise DocxParseError(f"missing part: {e}") from None
        rels: dict[str, str] = {}
        try:
            rels_xml = z.read("word/_rels/document.xml.rels")
            for rel in ET.fromstring(rels_xml).iter(f"{{{REL}}}Relationship"):
                rels[rel.get("Id")] = rel.get("Target")
        except KeyError:
            pass

    try:
        root = ET.fromstring(doc_xml)
    except ET.ParseError as e:
        raise DocxParseError(f"bad document.xml: {e}") from None
    body = root.find(f"{{{W}}}body")
    if body is None:
        raise DocxParseError("document.xml without w:body")
    return _body_spans(body, rels)


def _body_spans(body, rels):

    spans: list[tuple[str, str | None, str | None]] = []
    list_items: list[str] = []
    list_id: str | None = None

    def flush_list():
        nonlocal list_id
        if list_items:
            spans.append((KIND_LIST, list_to_text(list_items), None))
            list_items.clear()
        list_id = None

    for el in body:
        tag = el.tag
        if tag == f"{{{W}}}p":
            ref = _para_image_ref(el, rels)
            if ref is not None:
                flush_list()
                spans.append((KIND_IMAGE, None, ref))
                continue
            text = norm_ws(_runs_text(el))
            nid = _list_num_id(el)
            if nid is not None:
                if list_items and nid != list_id:
                    flush_list()
                if text:
                    list_items.append(text)
                    list_id = nid
                continue
            flush_list()
            if not text:
                continue
            style = _para_style(el)
            if style and style.startswith("Heading"):
                spans.append((KIND_HEADER, text, None))
            else:
                spans.append((KIND_TEXT, text, None))
        elif tag == f"{{{W}}}tbl":
            flush_list()
            grid = []
            for tr in el.findall(f"{{{W}}}tr"):
                grid.append([norm_ws(_runs_text(tc))
                             for tc in tr.findall(f"{{{W}}}tc")])
            if grid:
                spans.append((KIND_TABLE, table_to_text(grid), None))
        # sectPr and friends: no content
    flush_list()
    return spans


def extract_docx_headers_footers(
        data: bytes) -> list[tuple[str, str]]:
    """Page headers/footers of a docx -> [(part, text)] where part is
    'header' or 'footer' (r5; reference coverage comes free through
    pandoc's docx reader, extract_pandoc.py:98-167).  Parses every
    word/headerN.xml / word/footerN.xml part in name order with the
    same run/whitespace canonicalization as the body; empty parts are
    dropped.  These are PAGE FURNITURE, deliberately not body spans —
    the page_template operator models the analogous per-page repeated
    regions on the pdf side."""
    if not is_docx(data):
        raise DocxParseError("not a docx (PK magic / [Content_Types] probe)")
    out: list[tuple[str, str]] = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        for name in sorted(z.namelist()):
            m = re.fullmatch(r"word/(header|footer)\d+\.xml", name)
            if not m:
                continue
            try:
                root = ET.fromstring(z.read(name))
            except ET.ParseError:
                continue  # a broken furniture part never kills the doc
            text = norm_ws(_runs_text(root))
            if text:
                out.append((m.group(1), text))
    return out


_MEDIA_PREFIXES = ("word/media/", "Pictures/", "OEBPS/images/",
                   "OEBPS/Images/", "images/")


def extract_container_media(data: bytes) -> list[tuple[str, bytes]]:
    """Embedded media payloads of a zip container document ->
    [(target, bytes)] — the bytes behind the image spans' media_ref
    targets, so they can route through media_features like any other
    blob (r4 verdict item 6; the reference gets these via pandoc's
    media extraction, extract_pandoc.py:98-167).

    docx: rels-declared image targets (word/_rels/document.xml.rels)
    resolved against word/; odt/epub: the conventional media
    directories (Pictures/, OEBPS/images/); rtf (r6, content-probed
    like every container dispatch): hex \\pict payloads with the
    positional pict{n} targets the image spans carry.  Order = zip
    entry order (deterministic: the writers emit fixed layouts)."""
    from .rtf import extract_rtf_media, is_rtf

    if is_rtf(data):
        return extract_rtf_media(data)
    out: list[tuple[str, bytes]] = []
    seen: set[str] = set()
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            names = z.namelist()
            targets: list[tuple[str, str]] = []  # (media_ref target, part)
            try:
                rels_xml = z.read("word/_rels/document.xml.rels")
                for rel in ET.fromstring(rels_xml).iter(
                        f"{{{REL}}}Relationship"):
                    if rel.get("Type", "").endswith("/image"):
                        t = rel.get("Target") or ""
                        targets.append((t, "word/" + t.lstrip("/")))
            except (KeyError, ET.ParseError):
                pass
            for n in names:
                if n.startswith(_MEDIA_PREFIXES) and not n.endswith("/"):
                    targets.append((n, n))
            for target, part in targets:
                # dedupe by PART: a rels-declared word/media entry must
                # not also surface under its raw zip name
                if part in seen or part not in names:
                    continue
                seen.add(part)
                out.append((target, z.read(part)))
    except (zipfile.BadZipFile, OSError) as e:
        raise DocxParseError(f"bad container zip: {e}") from None
    return out


# ------------------------------------------------------------------ writer

_XML_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _xesc(s: str) -> str:
    return re.sub(r"[&<>\"]", lambda m: _XML_ESC[m.group(0)], s)


def _p(text: str, style: str | None = None, num: int | None = None) -> str:
    ppr = ""
    if style or num is not None:
        ppr = "<w:pPr>"
        if style:
            ppr += f'<w:pStyle w:val="{style}"/>'
        if num is not None:
            ppr += ('<w:numPr><w:ilvl w:val="0"/>'
                    f'<w:numId w:val="{num}"/></w:numPr>')
        ppr += "</w:pPr>"
    return (f"<w:p>{ppr}<w:r><w:t xml:space=\"preserve\">{_xesc(text)}"
            "</w:t></w:r></w:p>")


def build_tiny_docx(blocks: list[tuple],
                    header_text: str | None = None,
                    footer_text: str | None = None) -> bytes:
    """blocks -> deterministic docx bytes.  Block forms:
      ("header", text, level)   ("text", text)
      ("list", [items])         ("table", [[cells]])
      ("image", target)         e.g. target="media/image1.png"
      ("image", target, bytes)  embeds a REAL payload at word/<target>
                                (e.g. a build_bmp raster), extractable
                                via extract_container_media
    header_text / footer_text write word/header1.xml / footer1.xml
    parts (sectPr-referenced page furniture, read back via
    extract_docx_headers_footers).
    """
    body: list[str] = []
    images: list[str] = []
    payloads: dict[str, bytes] = {}
    n_lists = 0
    for blk in blocks:
        kind = blk[0]
        if kind == "header":
            body.append(_p(blk[1], style=f"Heading{blk[2]}"))
        elif kind == "text":
            body.append(_p(blk[1]))
        elif kind == "list":
            # one numId per list block: adjacent lists stay separate
            # (the parser splits list runs on numId change)
            n_lists += 1
            body.extend(_p(item, num=n_lists) for item in blk[1])
        elif kind == "table":
            rows = "".join(
                "<w:tr>" + "".join(
                    f"<w:tc>{_p(c)}</w:tc>" for c in row) + "</w:tr>"
                for row in blk[1]
            )
            body.append(f"<w:tbl>{rows}</w:tbl>")
        elif kind == "image":
            images.append(blk[1])
            if len(blk) > 2:
                payloads[blk[1]] = blk[2]
            rid = f"rId{len(images)}"
            body.append(
                "<w:p><w:r><w:drawing><wp:inline><a:graphic><a:graphicData>"
                f'<pic:pic><pic:blipFill><a:blip r:embed="{rid}"/>'
                "</pic:blipFill></pic:pic>"
                "</a:graphicData></a:graphic></wp:inline></w:drawing>"
                "</w:r></w:p>"
            )
        else:
            raise ValueError(f"unknown block kind: {kind}")

    # page-furniture parts (sectPr-referenced, ECMA-376 §17.10)
    furniture: list[tuple[str, str]] = []
    furniture_rels = ""
    sect_refs = ""
    if header_text is not None:
        furniture.append(("word/header1.xml", (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<w:hdr xmlns:w="{W}">{_p(header_text)}</w:hdr>')))
        furniture_rels += (
            f'<Relationship Id="rIdH" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/header" '
            'Target="header1.xml"/>')
        sect_refs += '<w:headerReference w:type="default" r:id="rIdH"/>'
    if footer_text is not None:
        furniture.append(("word/footer1.xml", (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<w:ftr xmlns:w="{W}">{_p(footer_text)}</w:ftr>')))
        furniture_rels += (
            f'<Relationship Id="rIdF" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/footer" '
            'Target="footer1.xml"/>')
        sect_refs += '<w:footerReference w:type="default" r:id="rIdF"/>'
    sect_pr = f"<w:sectPr>{sect_refs}</w:sectPr>" if sect_refs \
        else "<w:sectPr/>"

    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W}" xmlns:a="{A}" xmlns:r="{R}" '
        'xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/'
        'wordprocessingDrawing" '
        'xmlns:pic="http://schemas.openxmlformats.org/drawingml/2006/picture">'
        f"<w:body>{''.join(body)}{sect_pr}</w:body></w:document>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{REL}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/image" '
            f'Target="{t}"/>'
            for i, t in enumerate(images)
        )
        + furniture_rels
        + "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="png" ContentType="image/png"/>'
        '<Override PartName="/word/document.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.wordprocessingml.document.'
        'main+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{REL}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="word/document.xml"/>'
        "</Relationships>"
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, payload in [
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", root_rels),
            ("word/document.xml", document),
            ("word/_rels/document.xml.rels", rels),
        ] + furniture \
            + [(f"word/{t}", payloads.get(t, f"png-placeholder-{t}"))
               for t in dict.fromkeys(images)]:  # dedupe repeated targets
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, payload)
    return buf.getvalue()
