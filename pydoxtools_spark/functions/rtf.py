r"""From-scratch minimal RTF reader/writer pair.

The reference covers .rtf through pandoc (extract_pandoc.py:98-167);
pandoc is absent, so this parses the RTF 1.x subset that covers
ordinary word-processor output, from public-spec knowledge:

  groups        `{ ... }`, state scoped per group
  control words `\word[-]N` with the space-delimiter rule
  destinations  `\fonttbl \colortbl \stylesheet \info \pict` and any
                `{\*\...}` group are skipped wholesale
  text          `\'hh` cp1252-ish hex escapes, `\uN` unicode with the
                `\ucN` fallback-skip convention, `\\ \{ \} \~` escapes
  blocks        `\par` paragraph breaks; `\outlinelevelN` marks the
                paragraph a header; `\trowd ... \cell ... \row` tables
  lists         paragraphs carrying `\lsN` (Word list-override index)
                or a `{\listtext...}` / `{\pntext...}` marker group;
                adjacent items with the same list id merge into ONE
                list span (the docx-numId convention, so the
                cross-format property holds) — r5, closing the r4
                subset gap
  images        `{\pict ...hexdata}` groups (r6, closing the last
                container-media gap — reference parity
                extract_pandoc.py:98-167): a paragraph containing a
                pict becomes ONE image span, media_ref = positional
                'pict{n}' (RTF has no named parts; numbering is
                document order, 1-based), mirroring the docx
                image-paragraph rule.  The hex payload surfaces via
                extract_rtf_media -> container_media_blobs.  Word's
                dual emission `{\*\shppict{\pict..}}{\nonshppict
                {\pict..}}` yields exactly ONE image: the \* copy is
                destination-skipped, the unknown-word nonshppict
                fallthrough parses.  `\binN` binary payloads are out
                of subset (hex only).

Block -> span mapping matches the docx/odt/markdown branches (same
KIND_*, norm_ws / list_to_text / table_to_text canonical forms).
"""

from __future__ import annotations

import re

from ..constants import (
    KIND_HEADER,
    KIND_IMAGE,
    KIND_LIST,
    KIND_TABLE,
    KIND_TEXT,
)
from .spantext import list_to_text, norm_ws, table_to_text


class RtfParseError(ValueError):
    pass


def is_rtf(data: bytes) -> bool:
    return data[:5] == b"{\\rtf"


_TOKEN = re.compile(
    rb"\\'([0-9a-fA-F]{2})"        # hex escape
    rb"|\\([a-zA-Z]+)(-?\d+)? ?"   # control word (+optional param, space eaten)
    rb"|\\([^a-zA-Z])"             # control symbol
    rb"|([{}])"                    # group delimiters
    rb"|([^\\{}]+)"                # plain text run
)

_SURROGATE_PAIR = re.compile("[\ud800-\udbff][\udc00-\udfff]")


def _join_surrogates(s: str) -> str:
    """Recombine UTF-16 surrogate pairs emitted as two \\u words (the
    RTF convention for supplementary-plane chars) into real code
    points — Arrow/Spark strings reject lone surrogates."""
    return _SURROGATE_PAIR.sub(
        lambda m: chr(0x10000 + ((ord(m.group(0)[0]) - 0xD800) << 10)
                      + (ord(m.group(0)[1]) - 0xDC00)), s)


_SKIP_DESTINATIONS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"info",
    b"themedata", b"listtable", b"listoverridetable", b"generator",
    # list markers: the group TEXT is the rendered bullet/number, the
    # MARKER ITSELF flags the paragraph as a list item (handled at the
    # control-word site before the skip)
    b"listtext", b"pntext",
}


def extract_rtf_spans(
    data: bytes,
    media_out: list[tuple[str, bytes]] | None = None,
) -> list[tuple[str, str | None, str | None]]:
    """RTF bytes -> ordered (kind, text, media_ref) spans.  Pass a
    list as `media_out` to also collect (target, payload) for every
    \\pict with a non-empty valid-hex payload — ONE walk assigns the
    positional pict{n} targets, so span media_refs and media rows can
    never drift apart."""
    if not is_rtf(data):
        raise RtfParseError("not rtf (missing {\\rtf header)")

    spans: list[tuple[str, str | None, str | None]] = []
    para: list[str] = []
    grid: list[list[str]] = []
    row: list[str] = []
    header_level: int | None = None
    in_table = False
    para_ls: str | None = None   # this paragraph's list id (\ls / \pn)
    list_items: list[str] = []
    list_id: str | None = None
    para_pict: str | None = None  # this paragraph's image target
    n_picts = 0
    pict_buf: list[bytes] | None = None  # hex payload capture
    pict_target: str | None = None
    pict_depth = 0

    # group state stack: (skipping, uc_fallback_count)
    stack: list[tuple[bool, int]] = []
    skipping = False
    uc = 1
    pending_uc_skip = 0

    def flush_table():
        nonlocal grid, row, in_table
        if grid:
            spans.append((KIND_TABLE, table_to_text(grid), None))
        grid, row, in_table = [], [], False

    def flush_list():
        nonlocal list_id
        if list_items:
            spans.append((KIND_LIST, list_to_text(list_items), None))
            list_items.clear()
        list_id = None

    def finalize_pict():
        nonlocal pict_buf, pict_target
        if pict_buf is None:
            return
        hexstr = b"".join(pict_buf).translate(None, b" \t\r\n")
        try:
            payload = bytes.fromhex(hexstr.decode("latin-1"))
        except ValueError:
            payload = b""  # bad hex: keep the span, drop the bytes
        if media_out is not None and payload:
            media_out.append((pict_target, payload))
        pict_buf, pict_target = None, None

    def flush_para():
        nonlocal header_level, para_ls, list_id, para_pict
        t = _join_surrogates(norm_ws("".join(para)))
        para.clear()
        if not in_table:
            flush_table()
        if para_pict is not None:
            # docx image-paragraph rule (_para_image_ref): the whole
            # paragraph becomes one image span, its text is dropped
            flush_list()
            spans.append((KIND_IMAGE, None, para_pict))
            para_pict = None
            para_ls = None
            header_level = None
            return
        if para_ls is not None and header_level is None:
            # docx-numId convention: adjacent items sharing a list id
            # are ONE list; an id change starts a new span
            if list_items and para_ls != list_id:
                flush_list()
            if t:
                list_items.append(t)
                list_id = para_ls
            para_ls = None
            return
        flush_list()
        para_ls = None
        if not t:
            header_level = None
            return
        if header_level is not None:
            spans.append((KIND_HEADER, t, None))
        else:
            spans.append((KIND_TEXT, t, None))
        header_level = None

    def emit_text(s: str):
        nonlocal pending_uc_skip
        if skipping or not s:
            return
        if pending_uc_skip:
            take = min(pending_uc_skip, len(s))
            pending_uc_skip -= take
            s = s[take:]
            if not s:
                return
        para.append(s)

    for m in _TOKEN.finditer(data):
        hexesc, word, param, symbol, brace, text = m.groups()
        if brace is not None:
            if brace == b"{":
                stack.append((skipping, uc))
            else:
                if stack:
                    skipping, uc = stack.pop()
                if pict_buf is not None and len(stack) < pict_depth:
                    finalize_pict()  # the pict group just closed
            continue
        if skipping:
            # capture hex ONLY at the pict group's own depth: real Word
            # RTF nests destinations like {\*\blipuid <hex>} inside
            # \pict, and their hex is valid hex — appending it would
            # silently prepend garbage bytes to the decoded payload
            # (r6 advisor finding)
            if (pict_buf is not None and text is not None
                    and len(stack) == pict_depth):
                pict_buf.append(text)  # hex payload run
            continue
        if hexesc is not None:
            emit_text(bytes([int(hexesc, 16)]).decode("latin-1"))
            continue
        if symbol is not None:
            c = symbol.decode("latin-1")
            if c == "*":
                skipping = True  # {\*\...} destination
            elif c in "\\{}":
                emit_text(c)
            elif c == "~":
                emit_text(" ")
            elif c in "\r\n":
                pass
            continue
        if text is not None:
            emit_text(text.replace(b"\r", b"").replace(b"\n", b"")
                      .decode("latin-1"))
            continue
        # control word
        w = word
        n = int(param) if param is not None else None
        if w in _SKIP_DESTINATIONS:
            if w in (b"listtext", b"pntext"):
                para_ls = para_ls or "_marker"
            skipping = True
        elif w == b"pict":
            n_picts += 1
            para_pict = f"pict{n_picts}"
            pict_target = para_pict
            pict_buf = []
            pict_depth = len(stack)  # depth of the pict group itself
            skipping = True  # payload/props never leak into para text
        elif w == b"uc":
            uc = n or 0
        elif w == b"u":
            cp = n if n is not None else 0
            if cp < 0:
                cp += 65536
            emit_text(chr(cp))
            pending_uc_skip += uc
        elif w == b"par":
            flush_para()
        elif w in (b"line", b"tab"):
            emit_text(" ")
        elif w == b"outlinelevel":
            header_level = (n or 0) + 1
        elif w == b"ls":
            para_ls = str(n if n is not None else 0)
        elif w == b"pard":
            in_table = False
            para_ls = None
        elif w == b"trowd":
            if not in_table:
                flush_list()  # a table starting closes a pending list
            in_table = True
        elif w == b"intbl":
            if not in_table:
                flush_list()
            in_table = True
        elif w == b"cell":
            row.append(_join_surrogates(norm_ws("".join(para))))
            para.clear()
        elif w == b"row":
            if row:
                grid.append(row)
            row = []
        # all other control words: formatting, ignored
        # (\pard handled above: resets \intbl and the list marker)
    finalize_pict()  # unclosed pict group at EOF
    flush_para()
    flush_list()
    flush_table()
    return spans


def extract_rtf_media(data: bytes) -> list[tuple[str, bytes]]:
    """RTF bytes -> [(target, payload)] for every embedded \\pict —
    the same signature as docx.extract_container_media, so rtf blobs
    flow through container_media_blobs like any zip container.
    Targets are the positional pict{n} the image spans carry (one
    shared walk with extract_rtf_spans — numbering cannot drift)."""
    media: list[tuple[str, bytes]] = []
    extract_rtf_spans(data, media_out=media)
    return media


# ------------------------------------------------------------------ writer


def _rtf_esc(s: str) -> str:
    out = []
    for ch in s:
        cp = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif cp < 128:
            out.append(ch)
        elif cp <= 0xFFFF:
            # \u takes a SIGNED 16-bit value (RTF spec): CJK above
            # 0x7FFF goes negative
            out.append(f"\\u{cp - 65536 if cp > 32767 else cp}?")
        else:
            # supplementary plane: UTF-16 surrogate pair convention
            cp -= 0x10000
            hi = 0xD800 + (cp >> 10)
            lo = 0xDC00 + (cp & 0x3FF)
            out.append(f"\\u{hi - 65536}?\\u{lo - 65536}?")
    return "".join(out)


def build_tiny_rtf(blocks: list[tuple]) -> bytes:
    r"""blocks (header/text/list/table forms as in the docx/odt
    writers) -> deterministic RTF bytes.  List items carry the Word
    shape: a `{\listtext...}` marker group plus `\lsN`, one
    list-override index per list block so adjacent lists stay
    separate."""
    body: list[str] = []
    n_lists = 0
    for blk in blocks:
        kind = blk[0]
        if kind == "header":
            body.append(
                f"{{\\pard\\outlinelevel{blk[2] - 1} "
                f"{_rtf_esc(blk[1])}\\par}}")
        elif kind == "text":
            body.append(f"{{\\pard {_rtf_esc(blk[1])}\\par}}")
        elif kind == "list":
            n_lists += 1
            for item in blk[1]:
                body.append(
                    f"{{\\pard\\ls{n_lists}"
                    "{\\listtext\\u8226?\\tab}"
                    f" {_rtf_esc(item)}\\par}}")
        elif kind == "table":
            for r in blk[1]:
                cells = "".join(
                    f" {_rtf_esc(c)}\\cell" for c in r)
                cellx = "".join(
                    f"\\cellx{1000 * (i + 1)}" for i in range(len(r)))
                body.append(f"\\trowd{cellx}{cells}\\row ")
            body.append("{\\pard\\par}")
        elif kind == "image":
            # ("image", target[, payload]) — the docx/odt writer shape;
            # RTF has no named parts, so the target is ignored and the
            # reader assigns positional pict{n}.  The blip word is
            # cosmetic in the subset: consumers probe content magic.
            payload = blk[2] if len(blk) > 2 else b""
            body.append("{\\pard{\\pict\\pngblip "
                        + payload.hex() + "}\\par}")
        else:
            raise ValueError(f"unsupported rtf block kind: {kind}")
    doc = ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Helvetica;}}\n"
           + "\n".join(body) + "\n}")
    return doc.encode("latin-1")
