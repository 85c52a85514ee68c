"""Minimal PDF reader/writer pair for the bytes-ingestion path.

The reference parses real PDFs with pdfminer (pdf_utils.py:182-398:
page iteration, fonts, text lines, LTCurve graphics) and repairs broken
ones with a pikepdf re-save ladder (pdf_utils.py:81-148).  pdfminer is
not in this sandbox, so this module implements — from public PDF-spec
knowledge only (ISO 32000 content-stream operators) — the minimal
subset the fixture corpus needs:

  writer  build_tiny_pdf(pages)      deterministic PDF 1.4, uncompressed
                                     streams, classic xref table
  reader  parse_pdf_strict(data)     validates header + startxref/EOF
                                     trailer, then extracts page content
                                     streams in /Kids order
          parse_pdf_lenient(data)    the "repair" rung: ignores xref and
                                     trailer entirely, recovers raw
                                     `stream…endstream` blobs by byte
                                     order (what a pikepdf re-save
                                     effectively restores)
          pdf_elements_from_bytes    strict -> lenient ladder -> element
                                     rows (PDF_ELEMENT shape); raises
                                     PdfParseError only when BOTH fail —
                                     callers convert that to an error
                                     row, never a task failure

Content-stream operators handled: BT/ET, Tf (font+size), Tm (absolute
text matrix — the writer always positions with Tm), Td/TD (relative
line moves), Tj (show string), re (rect path), m/l (move/line), S/f
(paint).  Text bbox width uses the deterministic 0.5 em-per-char
Helvetica-ish heuristic — writer and reader share it, so layout
round-trips exactly.
"""

from __future__ import annotations

import re

PAGE_W, PAGE_H = 612.0, 792.0
CHAR_EM = 0.5  # average glyph advance as a fraction of font size


class PdfParseError(ValueError):
    pass


# ------------------------------------------------------------------ writer


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("utf-8")


def build_tiny_pdf(pages: list[dict]) -> bytes:
    """pages: [{"texts": [(x, y, size, text)], "rects": [(x, y, w, h)],
    "lines": [(x0, y0, x1, y1)]}] -> PDF bytes.  One content stream per
    page; every text line is its own BT/ET block positioned with Tm."""
    objs: list[bytes] = []  # 1-indexed object bodies

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    font_obj = 3 + 2 * n_pages
    for i, page in enumerate(pages):
        content = bytearray()
        for x, y, size, text in page.get("texts", []):
            content += b"BT /F1 %.2f Tf 1 0 0 1 %.2f %.2f Tm (" % (size, x, y)
            content += _esc(text)
            content += b") Tj ET\n"
        for x, y, w, h in page.get("rects", []):
            content += b"%.2f %.2f %.2f %.2f re S\n" % (x, y, w, h)
        for x0, y0, x1, y1 in page.get("lines", []):
            content += b"%.2f %.2f m %.2f %.2f l S\n" % (x0, y0, x1, y1)
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W:g} "
            f"{PAGE_H:g}] /Contents {4 + 2 * i} 0 R /Resources "
            f"<< /Font << /F1 {font_obj} 0 R >> >> >>".encode()
        )
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# ------------------------------------------------------------------ reader

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


def _content_streams_strict(data: bytes) -> list[bytes]:
    if not data.startswith(b"%PDF-"):
        raise PdfParseError("missing %PDF header")
    tail = data[-200:]
    sx = tail.rfind(b"startxref")
    if sx < 0 or b"%%EOF" not in tail:
        raise PdfParseError("missing startxref/%%EOF trailer")
    try:
        xref_at = int(tail[sx + 9:].split()[0])
    except (ValueError, IndexError) as e:
        raise PdfParseError(f"bad startxref: {e}") from None
    if not data[xref_at:xref_at + 4] == b"xref":
        raise PdfParseError("startxref does not point at an xref table")

    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)
    }
    pages_obj = next(
        (b for b in objs.values() if b"/Type /Pages" in b or b"/Type/Pages" in b),
        None,
    )
    if pages_obj is None:
        raise PdfParseError("no /Pages object")
    kids_m = _KIDS_RE.search(pages_obj)
    if not kids_m:
        raise PdfParseError("no /Kids")
    streams = []
    for ref in _REF_RE.finditer(kids_m.group(1)):
        page = objs.get(int(ref.group(1)))
        if page is None:
            raise PdfParseError("dangling /Kids reference")
        cm = _CONTENTS_RE.search(page)
        if not cm:
            raise PdfParseError("page without /Contents")
        cobj = objs.get(int(cm.group(1)))
        if cobj is None:
            raise PdfParseError("dangling /Contents reference")
        sm = _STREAM_RE.search(cobj)
        if not sm:
            raise PdfParseError("contents object without stream")
        streams.append(sm.group(1))
    return streams


def _content_streams_lenient(data: bytes) -> list[bytes]:
    """Repair rung (pdf_utils.py:81-148 semantics): structure damaged
    (xref/trailer/header) but stream payloads intact — recover every
    stream blob in byte order and treat each as one page's content."""
    streams = [m.group(1) for m in _STREAM_RE.finditer(data)]
    if not streams:
        raise PdfParseError("no recoverable content streams")
    return streams


_STR_TOKEN = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.S)


def _unesc(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash escape
            out.append(raw[i + 1])
            i += 2
        else:
            out.append(c)
            i += 1
    return out.decode("utf-8", errors="replace")


def _parse_content(stream: bytes):
    """One content stream -> (texts [(x, y, size, text)],
    graphics [(x0, y0, x1, y1)]).  Tiny postfix interpreter over the
    operator subset (ISO 32000 §9.4 text ops, §8.5 path ops)."""
    texts, graphics = [], []
    # tokenize: strings as single tokens, everything else whitespace-split
    pos = 0
    tokens: list[object] = []
    for m in _STR_TOKEN.finditer(stream):
        tokens.extend(stream[pos:m.start()].split())
        tokens.append(("str", _unesc(m.group(0)[1:-1])))
        pos = m.end()
    tokens.extend(stream[pos:].split())

    stack: list[object] = []
    size = 12.0
    tx = ty = 0.0
    lx = ly = 0.0  # text line start (for Td/TD)
    cur_x = cur_y = 0.0  # path current point
    path_min = path_max = None

    def num(v):
        return float(v)

    for tok in tokens:
        if isinstance(tok, tuple):
            stack.append(tok)
            continue
        op = tok
        if op == b"Tf":
            size = num(stack[-1])
            stack.clear()
        elif op == b"Tm":
            tx, ty = num(stack[-2]), num(stack[-1])
            lx, ly = tx, ty
            stack.clear()
        elif op in (b"Td", b"TD"):
            lx, ly = lx + num(stack[-2]), ly + num(stack[-1])
            tx, ty = lx, ly
            stack.clear()
        elif op == b"Tj":
            s = stack[-1][1] if isinstance(stack[-1], tuple) else ""
            texts.append((tx, ty, size, s))
            tx += CHAR_EM * size * len(s)
            stack.clear()
        elif op == b"re":
            x, y, w, h = (num(v) for v in stack[-4:])
            graphics.append((x, y, x + w, y + h))
            stack.clear()
        elif op == b"m":
            cur_x, cur_y = num(stack[-2]), num(stack[-1])
            path_min, path_max = (cur_x, cur_y), (cur_x, cur_y)
            stack.clear()
        elif op == b"l":
            cur_x, cur_y = num(stack[-2]), num(stack[-1])
            if path_min is not None:
                path_min = (min(path_min[0], cur_x), min(path_min[1], cur_y))
                path_max = (max(path_max[0], cur_x), max(path_max[1], cur_y))
            stack.clear()
        elif op in (b"S", b"f", b"B"):
            if path_min is not None:
                graphics.append((path_min[0], path_min[1],
                                 path_max[0], path_max[1]))
                path_min = path_max = None
            stack.clear()
        elif op in (b"BT", b"ET"):
            stack.clear()
        else:
            stack.append(op)
    return texts, graphics


def pdf_elements_from_bytes(data: bytes, doc_id: str,
                            emit_chars: bool = False) -> list[dict]:
    """PDF bytes -> PDF_ELEMENT-shaped rows via the strict -> lenient
    repair ladder.  Raises PdfParseError when both rungs fail.

    emit_chars additionally materializes one type='Char' row per glyph
    (deterministic 0.5 em advance — the same heuristic the line bbox
    uses), feeding the full-fidelity table path (table_mode='chars':
    word rebuild / sweep-line / frozen validity tree)."""
    try:
        streams = _content_streams_strict(data)
    except PdfParseError:
        streams = _content_streams_lenient(data)  # may raise: caller contains

    rows: list[dict] = []
    boxnum = 0
    for p, stream in enumerate(streams):
        texts, graphics = _parse_content(stream)
        for x, y, size, text in texts:
            boxnum += 1
            rows.append(dict(
                doc_id=doc_id, p_num=p, boxnum=boxnum, linenum=0,
                type="Text", x0=x, y0=y,
                x1=x + CHAR_EM * size * len(text), y1=y + size,
                rawtext=text, font_name="F1", font_size=size,
                font_color=None, mean_char_orientation=0.0,
                linewidth=None, media_ref=None,
            ))
            if emit_chars:
                w = CHAR_EM * size
                for k, ch in enumerate(text):
                    if ch.isspace():
                        continue  # glyph advance only; no box for spaces
                    boxnum += 1
                    rows.append(dict(
                        doc_id=doc_id, p_num=p, boxnum=boxnum, linenum=0,
                        type="Char", x0=x + k * w, y0=y,
                        x1=x + (k + 1) * w, y1=y + size,
                        rawtext=ch, font_name="F1", font_size=size,
                        font_color=None, mean_char_orientation=0.0,
                        linewidth=None, media_ref=None,
                    ))
        for x0, y0, x1, y1 in graphics:
            boxnum += 1
            rows.append(dict(
                doc_id=doc_id, p_num=p, boxnum=boxnum, linenum=0,
                type="Graphic", x0=x0, y0=y0, x1=x1, y1=y1,
                rawtext=None, font_name=None, font_size=None,
                font_color=None, mean_char_orientation=None,
                linewidth=1.0, media_ref=None,
            ))
    return rows
