"""Deterministic synthetic corpus generator (FIXTURES.md §1-4).

Generates the interleaved input table
  documents_in(doc_id, spans array<struct<kind,text,media_ref,offset>>)
plus the pre-parsed `pdf_elements` side table and the golden
`extracted_expected` table — golden spans are emitted BY CONSTRUCTION
(the generator knows which blocks are main content), so span equality
tests the kernels' heuristics against ground truth, not against
themselves.

Everything is a pure function of (doc index, seed): generation can run
per-partition on executors via mapInPandas with identical results
regardless of partitioning — this is how the bench corpus is built at
scale without a driver-side loop.

HTML payload recipe mirrors FIXTURES.md §2 (reference heuristics it must
exercise: extract_html.py:101-183, html_utils.py:90-118,163).
PDF layout recipe mirrors FIXTURES.md §3 (reference pdf_utils.py:286-398
element schema; reading order extract_textstructure.py:418).
"""

from __future__ import annotations

import random

from .constants import (
    IN_KIND_HTML,
    IN_KIND_IMAGE_REF,
    IN_KIND_PDF_REF,
    IN_KIND_TEXT,
    KIND_HEADER,
    KIND_IMAGE,
    KIND_LIST,
    KIND_MEDIA,
    KIND_TABLE,
    KIND_TEXT,
    PARAGRAPH_JOIN,
)
from .functions.spantext import list_to_text, table_to_text

_WORDS = (
    "data spark table query join filter merge sort window stream batch row "
    "column key value hash scan agg group order part line item customer "
    "supplier region nation price quantity total status flag date comment "
    "engine plan shuffle skew broadcast partition snapshot lineage metric"
).split()

GIANT_DOC_PERIOD = 97  # doc_idx % 97 == 13 -> giant doc (skew fixture)
GIANT_SCALE = 60


def _rng(doc_idx: int, seed: int) -> random.Random:
    return random.Random((seed << 32) ^ (doc_idx * 2654435761 % (1 << 61)))


def _sentence(rng: random.Random, lo=4, hi=12) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randint(lo, hi)))


def _paragraph(rng: random.Random, scale: int = 1) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(2, 5) * scale))


# --------------------------------------------------------------- HTML


def _gen_html_payload(rng: random.Random, scale: int):
    """Returns (raw_html, golden (kind,text,media_ref) list)."""
    golden: list[tuple[str, str | None, str | None]] = []
    parts: list[str] = ["<html><head><title>", _sentence(rng, 2, 5), "</title></head><body>"]

    # boilerplate nav: link-only lists -> must be dropped
    nav_items = "".join(
        f'<li><a href="/x/{rng.randint(0, 99)}">{_sentence(rng, 1, 3)}</a></li>'
        for _ in range(rng.randint(3, 7))
    )
    parts.append(f"<nav><ul>{nav_items}</ul></nav>")
    parts.append(f'<header><a href="/home">{_sentence(rng, 1, 2)}</a></header>')

    # main content under nested divs (depth feature)
    parts.append('<div id="outer"><div class="content"><article>')
    title = _sentence(rng, 2, 6)
    parts.append(f"<h1>{title}</h1>")
    golden.append((KIND_HEADER, title, None))

    n_paras = rng.randint(3, 8) * scale
    n_lists = rng.randint(0, 3)
    n_tables = rng.randint(0, 2)
    n_media = rng.randint(0, 3)
    slots = (
        ["p"] * n_paras + ["ul"] * n_lists + ["table"] * n_tables + ["media"] * n_media
    )
    rng.shuffle(slots)
    for slot in slots:
        if slot == "p":
            p = _paragraph(rng)
            parts.append(f"<p>{p}</p>")
            golden.append((KIND_TEXT, p, None))
        elif slot == "ul":
            items = [_sentence(rng, 2, 6) for _ in range(rng.randint(2, 6))]
            parts.append("<ul>" + "".join(f"<li>{i}</li>" for i in items) + "</ul>")
            golden.append((KIND_LIST, list_to_text(items), None))
        elif slot == "table":
            nr, nc = rng.randint(2, 6), rng.randint(2, 4)
            rows = [[_sentence(rng, 1, 3) for _ in range(nc)] for _ in range(nr)]
            parts.append(
                "<table>"
                + "".join(
                    "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>"
                    for row in rows
                )
                + "</table>"
            )
            golden.append((KIND_TABLE, table_to_text(rows), None))
        else:  # media
            if rng.random() < 0.5:
                src = f"media://img/h{rng.randint(0, 10**6)}"
                parts.append(f'<img src="{src}">')
                golden.append((KIND_IMAGE, None, src))
            else:
                href = f"/files/report_{rng.randint(0, 10**6)}.pdf"
                parts.append(f'<a href="{href}">{_sentence(rng, 1, 3)}</a>')
                golden.append((KIND_MEDIA, None, href))

    parts.append("</article></div></div>")
    # footer boilerplate: link list + short link-dense block
    foot = "".join(
        f'<a href="/f/{i}">{rng.choice(_WORDS)}</a>' for i in range(rng.randint(2, 5))
    )
    parts.append(f"<footer><p>{foot}</p></footer></body></html>")
    return "".join(parts), golden


# --------------------------------------------------------------- text


def _gen_text_payload(rng: random.Random, scale: int):
    paras = [_paragraph(rng) for _ in range(rng.randint(2, 7) * scale)]
    golden = [(KIND_TEXT, p, None) for p in paras]
    return PARAGRAPH_JOIN.join(paras), golden


# ----------------------------------------------------- markdown / wiki


def _gen_markdown_payload(rng: random.Random, scale: int):
    """Markdown doc with by-construction goldens.  Always emits an ATX
    title, >=1 list and >=1 fenced code block, so the dispatch
    heuristic (>=3 pattern families, document.py:66-89) is guaranteed
    to route it to the markdown branch."""
    golden: list[tuple[str, str | None, str | None]] = []
    parts: list[str] = []

    title = _sentence(rng, 2, 5)
    parts.append("# " + title)
    golden.append((KIND_HEADER, title, None))

    slots = (["p"] * rng.randint(2, 5) * scale + ["ul", "code"]
             + ["ol"] * rng.randint(0, 1) + ["table"] * rng.randint(0, 2)
             + ["img"] * rng.randint(0, 1) + ["h2"] * rng.randint(0, 2))
    rng.shuffle(slots)
    for slot in slots:
        if slot == "p":
            p = _paragraph(rng)
            parts.append(p)
            golden.append((KIND_TEXT, p, None))
        elif slot == "h2":
            h = _sentence(rng, 2, 5)
            parts.append("## " + h)
            golden.append((KIND_HEADER, h, None))
        elif slot in ("ul", "ol"):
            items = [_sentence(rng, 2, 6) for _ in range(rng.randint(2, 5))]
            marker = "- " if slot == "ul" else "1. "
            parts.append("\n".join(marker + i for i in items))
            golden.append((KIND_LIST, list_to_text(items), None))
        elif slot == "code":
            lines = [_sentence(rng, 2, 5) for _ in range(rng.randint(1, 4))]
            parts.append("```\n" + "\n".join(lines) + "\n```")
            golden.append((KIND_TEXT, "\n".join(lines), None))
        elif slot == "table":
            nr, nc = rng.randint(2, 4), rng.randint(2, 4)
            rows = [[_sentence(rng, 1, 2) for _ in range(nc)]
                    for _ in range(nr)]
            md = ["| " + " | ".join(rows[0]) + " |",
                  "|" + "|".join(" --- " for _ in range(nc)) + "|"]
            md += ["| " + " | ".join(r) + " |" for r in rows[1:]]
            parts.append("\n".join(md))
            golden.append((KIND_TABLE, table_to_text(rows), None))
        else:  # img
            src = f"media://img/m{rng.randint(0, 10**6)}"
            parts.append(f"![{_sentence(rng, 1, 2)}]({src})")
            golden.append((KIND_IMAGE, None, src))
    return "\n\n".join(parts), golden


def _gen_wiki_payload(rng: random.Random, scale: int):
    """Mediawiki doc: == headers ==, * lists, [[links]], {{templates}};
    the '== x ==' / wiki-link markers trip MEDIAWIKI_SNIFF so dispatch
    routes it through the wiki alias (document.py:107-113)."""
    golden: list[tuple[str, str | None, str | None]] = []
    parts: list[str] = []

    title = _sentence(rng, 2, 5)
    parts.append(f"== {title} ==")
    golden.append((KIND_HEADER, title, None))

    slots = ["p"] * rng.randint(2, 5) * scale + ["ul"] + ["h2"] * rng.randint(0, 2)
    rng.shuffle(slots)
    for slot in slots:
        if slot == "p":
            p = _paragraph(rng)
            label = _sentence(rng, 1, 2)
            # one wiki link + one template marker inside the paragraph
            raw = f"{p} {{{{cite {rng.choice(_WORDS)}}}}} [[Target|{label}]]"
            parts.append(raw)
            golden.append((KIND_TEXT, f"{p} {label}", None))
        elif slot == "h2":
            h = _sentence(rng, 2, 5)
            parts.append(f"=== {h} ===")
            golden.append((KIND_HEADER, h, None))
        else:
            items = [_sentence(rng, 2, 6) for _ in range(rng.randint(2, 5))]
            parts.append("\n".join("* " + i for i in items))
            golden.append((KIND_LIST, list_to_text(items), None))
    return "\n\n".join(parts), golden


# --------------------------------------------------------------- PDF

PAGE_W, PAGE_H = 612.0, 792.0
BODY_FONT, TITLE_FONT = 10.0, 18.0
LINE_H = 14.0


def _gen_pdf_payload(rng: random.Random, ref_id: str, scale: int):
    """Returns (element rows list[dict], golden spans).

    Layout per FIXTURES.md §3: title line (large font, top) -> 2-6 text
    boxes in two columns -> 0-2 ruled tables -> noise graphics -> 0-1
    vertical line.  Reading order: p_num asc, y0 desc, x0 asc
    (extract_textstructure.py:418).
    """
    elements: list[dict] = []
    golden: list[tuple[str, str | None, str | None]] = []
    n_pages = max(1, rng.randint(1, 2) * scale)
    boxnum = 0

    def el(**kw):
        base = dict(
            doc_id=ref_id, p_num=0, boxnum=0, linenum=0, type="Text",
            x0=0.0, y0=0.0, x1=0.0, y1=0.0, rawtext=None,
            font_name="Helv", font_size=BODY_FONT, font_color="#000",
            mean_char_orientation=0.0, linewidth=None, media_ref=None,
        )
        base.update(kw)
        elements.append(base)

    for p in range(n_pages):
        # ordered content: list of (y0_bottom, x0, golden_span); golden
        # reading order = y0 desc, x0 asc on the merged-box BOTTOM edge,
        # exactly the reference's sort key (groupby y0=min then
        # sort_values(["p_num","y0","x0"], ascending=[True,False,True]),
        # extract_textstructure.py:105-119,418).
        page_spans: list[tuple[float, float, tuple]] = []

        # 1. title line at top
        title = _sentence(rng, 2, 6)
        ty = PAGE_H - 60.0
        boxnum += 1
        el(p_num=p, boxnum=boxnum, linenum=0, x0=72.0, y0=ty, x1=400.0,
           y1=ty + TITLE_FONT, rawtext=title, font_size=TITLE_FONT,
           font_name="Helv-Bold")
        page_spans.append((ty, 72.0, (KIND_HEADER, title, None)))

        # 2. text boxes in two columns
        col_x = [72.0, 320.0]
        y_cursor = [ty - 40.0, ty - 40.0]
        n_boxes = rng.randint(2, 5)
        for _ in range(n_boxes):
            ci = rng.randint(0, 1)
            x0 = col_x[ci]
            n_lines = rng.randint(1, 5)
            lines = [_sentence(rng, 3, 7) for _ in range(n_lines)]
            top = y_cursor[ci]
            boxnum += 1
            for li, ltext in enumerate(lines):
                ly = top - li * LINE_H
                el(p_num=p, boxnum=boxnum, linenum=li, x0=x0, y0=ly,
                   x1=x0 + 200.0, y1=ly + BODY_FONT + 2, rawtext=ltext)
            y_cursor[ci] = top - n_lines * LINE_H - 20.0
            bottom = top - (n_lines - 1) * LINE_H  # merged-box y0 (min)
            page_spans.append((bottom, x0, (KIND_TEXT, " ".join(lines), None)))

        # 3. ruled table low on the page
        if rng.random() < 0.6:
            # cell_h=28 keeps even a 2-row table above the 50pt min area
            # height filter (extract_tables.py:1177-1210 analogue)
            nr, nc = rng.randint(2, 4), rng.randint(2, 4)
            cell_w, cell_h = 90.0, 28.0
            tx0, ty1 = 72.0, min(y_cursor) - 30.0
            ty0 = ty1 - nr * cell_h
            rows_text = []
            boxnum += 1
            tb = boxnum
            # grid lines: nr+1 horizontal, nc+1 vertical (Graphic)
            for r in range(nr + 1):
                y = ty1 - r * cell_h
                el(p_num=p, boxnum=tb, type="Graphic", x0=tx0, y0=y,
                   x1=tx0 + nc * cell_w, y1=y, linewidth=1.0)
            for c in range(nc + 1):
                x = tx0 + c * cell_w
                el(p_num=p, boxnum=tb, type="Graphic", x0=x, y0=ty0,
                   x1=x, y1=ty1, linewidth=1.0)
            # cell texts
            for r in range(nr):
                row = []
                for c in range(nc):
                    t = _sentence(rng, 1, 2)
                    row.append(t)
                    cx = tx0 + c * cell_w + 4.0
                    cy = ty1 - (r + 1) * cell_h + 7.0
                    boxnum += 1
                    el(p_num=p, boxnum=boxnum, x0=cx, y0=cy,
                       x1=cx + cell_w - 8.0, y1=cy + BODY_FONT, rawtext=t)
                rows_text.append(row)
            page_spans.append((ty0, tx0, (KIND_TABLE, table_to_text(rows_text), None)))

        # 4. image element (x0=480 keeps it clear of the table, whose
        # max x1 = 72 + 4*90 = 432)
        if rng.random() < 0.4:
            ix0 = 480.0
            iy1 = min(y_cursor) - 40.0
            iy0 = iy1 - 80.0
            mref = f"media://img/p{rng.randint(0, 10**6)}"
            boxnum += 1
            el(p_num=p, boxnum=boxnum, type="Image", x0=ix0, y0=iy0,
               x1=ix0 + 100.0, y1=iy1, media_ref=mref)
            page_spans.append((iy0, ix0, (KIND_IMAGE, None, mref)))

        # 5. noise graphics that must be filtered out
        for _ in range(rng.randint(0, 3)):
            gx, gy = rng.uniform(0, PAGE_W), rng.uniform(0, PAGE_H)
            boxnum += 1
            if rng.random() < 0.5:  # tiny decoration
                el(p_num=p, boxnum=boxnum, type="Graphic", x0=gx, y0=gy,
                   x1=gx + 2.0, y1=gy + 2.0, linewidth=0.5)
            else:  # huge page-background rect (>=40% page area)
                el(p_num=p, boxnum=boxnum, type="Graphic", x0=10.0, y0=10.0,
                   x1=PAGE_W - 10.0, y1=PAGE_H - 10.0, linewidth=0.5)

        # 6. vertical text line (must be excluded)
        if rng.random() < 0.3:
            boxnum += 1
            el(p_num=p, boxnum=boxnum, rawtext=_sentence(rng, 2, 4),
               x0=PAGE_W - 30.0, y0=200.0, x1=PAGE_W - 20.0, y1=400.0,
               mean_char_orientation=90.0)

        # golden order for this page: y_top desc, then x asc
        page_spans.sort(key=lambda s: (-s[0], s[1]))
        golden.extend(s[2] for s in page_spans)

    return elements, golden


# ------------------------------------------------- char-level PDF (full)

CHAR_W, CHAR_H = 5.0, 8.0


def _emit_char_table(el, rng, p, boxnum, tx0, ty1, nr, nc,
                     cell_w=90.0, cell_h=20.0, words_per_cell=2,
                     word_len=(4, 6), span_top=False, sparse=False):
    """Emit one ruled table as graphics + Char elements + Text cell
    lines.  Returns (next_boxnum, expected_grid, bbox) — the grid is the
    BY-CONSTRUCTION golden the full-fidelity kernel must recover
    (spanning header text repeats at every covered position, mirroring
    extract_tables.py:601-606).  sparse tables are constructed to FAIL
    the frozen validity tree (words_area_sum/h - h/cells <= T2)."""
    ty0 = ty1 - nr * cell_h
    for r in range(nr + 1):
        y = ty1 - r * cell_h
        boxnum += 1
        el(p_num=p, boxnum=boxnum, type="Graphic", x0=tx0, y0=y,
           x1=tx0 + nc * cell_w, y1=y, linewidth=1.0)
    for c in range(nc + 1):
        x = tx0 + c * cell_w
        top = ty1 - cell_h if (span_top and 0 < c < nc) else ty1
        boxnum += 1
        el(p_num=p, boxnum=boxnum, type="Graphic", x0=x, y0=ty0,
           x1=x, y1=top, linewidth=1.0)
    grid = []
    for r in range(nr):  # r = 0 is the TOP row
        row = []
        cols = 1 if (span_top and r == 0) else nc
        for c in range(cols):
            cy = ty1 - (r + 1) * cell_h + 6.0
            cx0 = tx0 + c * cell_w + 4.0
            cx = cx0
            n_words = 1 if sparse else words_per_cell
            ws = []
            for _ in range(n_words):
                wl = 1 if sparse else rng.randint(*word_len)
                t = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                            for _ in range(wl))
                boxnum += 1
                for k, chch in enumerate(t):
                    el(p_num=p, boxnum=boxnum, type="Char",
                       x0=cx + k * CHAR_W, y0=cy,
                       x1=cx + (k + 1) * CHAR_W, y1=cy + CHAR_H, rawtext=chch)
                ws.append(t)
                cx += len(t) * CHAR_W + CHAR_W
            cell_txt = " ".join(ws)
            # cell text also exists as a normal Text line (consumed by
            # the covered-box anti-join when the table is valid)
            boxnum += 1
            el(p_num=p, boxnum=boxnum, type="Text", x0=cx0, y0=cy,
               x1=cx - CHAR_W, y1=cy + CHAR_H, rawtext=cell_txt)
            row.append(cell_txt)
        if span_top and r == 0:
            row = row * nc
        grid.append(row)
    bbox = (tx0, ty0, tx0 + nc * cell_w, ty1)
    return boxnum, grid, bbox


def gen_chars_doc(doc_idx: int, seed: int = 42):
    """Char-level PDF doc for the full-fidelity table path: title +
    text box + valid char table (sometimes with a spanning header) +
    a sparse candidate the frozen tree must reject (its 1-char lines
    then fall below MIN_BOX_TEXT_CHARS, so it contributes no spans)."""
    rng = _rng(doc_idx ^ 0x5AB1E, seed)
    doc_id = f"cdoc_{doc_idx:08d}"
    ref = f"media://pdf/{doc_id}_0"
    elements: list[dict] = []

    def el(**kw):
        base = dict(
            doc_id=ref, p_num=0, boxnum=0, linenum=0, type="Text",
            x0=0.0, y0=0.0, x1=0.0, y1=0.0, rawtext=None,
            font_name="Helv", font_size=BODY_FONT, font_color="#000",
            mean_char_orientation=0.0, linewidth=None, media_ref=None,
        )
        base.update(kw)
        elements.append(base)

    page_spans: list[tuple[float, float, tuple]] = []
    boxnum = 0

    title = _sentence(rng, 2, 5)
    ty = PAGE_H - 50.0
    boxnum += 1
    el(boxnum=boxnum, x0=72.0, y0=ty, x1=380.0, y1=ty + TITLE_FONT,
       rawtext=title, font_size=TITLE_FONT)
    page_spans.append((ty, 72.0, (KIND_HEADER, title, None)))

    para = _sentence(rng, 5, 9)
    py = ty - 40.0
    boxnum += 1
    el(boxnum=boxnum, x0=72.0, y0=py, x1=300.0, y1=py + BODY_FONT + 2,
       rawtext=para)
    page_spans.append((py, 72.0, (KIND_TEXT, para, None)))

    # valid table (area > 2500, words sized to pass the frozen tree)
    nr, nc = rng.randint(3, 5), rng.randint(2, 3)
    span_top = rng.random() < 0.5
    boxnum, grid, bbox = _emit_char_table(
        el, rng, 0, boxnum, tx0=72.0, ty1=py - 40.0, nr=nr, nc=nc,
        span_top=span_top)
    page_spans.append((bbox[1], bbox[0], (KIND_TABLE, table_to_text(grid), None)))

    # sparse candidate below: rejected by the tree, no spans emitted
    boxnum, _g, _b = _emit_char_table(
        el, rng, 0, boxnum, tx0=72.0, ty1=bbox[1] - 40.0, nr=2, nc=2,
        cell_h=30.0, sparse=True)

    page_spans.sort(key=lambda s: (-s[0], s[1]))
    golden = [s[2] for s in page_spans]

    doc_row = {"doc_id": doc_id, "spans": [
        {"kind": IN_KIND_PDF_REF, "text": None, "media_ref": ref, "offset": 0}]}
    expected_row = {"doc_id": doc_id, "spans": _with_offsets(golden)}
    return doc_row, elements, expected_row


def gen_chars_corpus(n_docs: int, seed: int = 42):
    docs, pdf, exp = [], [], []
    for i in range(n_docs):
        d, p, e = gen_chars_doc(i, seed)
        docs.append(d)
        pdf.extend(p)
        exp.append(e)
    return docs, pdf, exp


# --------------------------------------------------------------- doc


def _with_offsets(spans):
    """Assign the canonical offset: running char offset of span text in the
    doc's extracted text stream (media spans contribute 0)."""
    out, off = [], 0
    for kind, text, ref in spans:
        out.append({"kind": kind, "text": text, "media_ref": ref, "offset": off})
        off += len(text) if text else 0
    return out


def gen_doc(doc_idx: int, seed: int = 42):
    """Pure function: doc index -> (documents_in row, pdf_elements rows,
    expected row)."""
    rng = _rng(doc_idx, seed)
    doc_id = f"doc_{doc_idx:08d}"
    scale = GIANT_SCALE if doc_idx % GIANT_DOC_PERIOD == 13 else 1

    in_spans: list[dict] = []
    pdf_rows: list[dict] = []
    golden: list[tuple] = []
    offset = 0

    n_in = rng.randint(1, 4)
    # "md"/"wiki" are payload FLAVORS of IN_KIND_TEXT (markdown is
    # detected by content dispatch, not by input kind — document.py:66-113)
    kinds = [rng.choices(
        [IN_KIND_HTML, IN_KIND_TEXT, "md", "wiki", IN_KIND_PDF_REF,
         IN_KIND_IMAGE_REF],
        weights=[4, 2, 1, 1, 2, 1])[0] for _ in range(n_in)]

    for i, k in enumerate(kinds):
        if k == IN_KIND_HTML:
            payload, g = _gen_html_payload(rng, scale)
            in_spans.append({"kind": k, "text": payload, "media_ref": None,
                             "offset": offset})
            offset += len(payload)
        elif k in (IN_KIND_TEXT, "md", "wiki"):
            gen = {"md": _gen_markdown_payload,
                   "wiki": _gen_wiki_payload}.get(k, _gen_text_payload)
            payload, g = gen(rng, scale)
            in_spans.append({"kind": IN_KIND_TEXT, "text": payload,
                             "media_ref": None, "offset": offset})
            offset += len(payload)
        elif k == IN_KIND_PDF_REF:
            ref = f"media://pdf/{doc_id}_{i}"
            rows, g = _gen_pdf_payload(rng, ref, scale)
            pdf_rows.extend(rows)
            in_spans.append({"kind": k, "text": None, "media_ref": ref,
                             "offset": offset})
        else:  # image_ref passthrough
            ref = f"media://img/{doc_id}_{i}"
            g = [(KIND_IMAGE, None, ref)]
            in_spans.append({"kind": k, "text": None, "media_ref": ref,
                             "offset": offset})
        golden.extend(g)

    doc_row = {"doc_id": doc_id, "spans": in_spans}
    expected_row = {"doc_id": doc_id, "spans": _with_offsets(golden)}
    return doc_row, pdf_rows, expected_row


def gen_corpus(n_docs: int, seed: int = 42):
    """Driver-side generation for tests (small n)."""
    docs, pdf, exp = [], [], []
    for i in range(n_docs):
        d, p, e = gen_doc(i, seed)
        docs.append(d)
        pdf.extend(p)
        exp.append(e)
    return docs, pdf, exp


def write_corpus(spark, out_dir: str, n_docs: int, seed: int = 42,
                 partitions: int = 32) -> None:
    """Distributed generation: doc indices -> mapInPandas -> parquet.

    Deterministic regardless of partitioning (gen_doc is pure in
    (idx, seed)).  At 10^12-doc scale this is how the corpus would be
    materialized into Iceberg; here we write parquet.
    """
    import pandas as pd

    from .schemas import DOCUMENTS_IN, PDF_ELEMENT

    idx_df = spark.range(0, n_docs, 1, partitions)

    def gen_docs_batch(it):
        for pdf_batch in it:
            rows = [gen_doc(int(i), seed)[0] for i in pdf_batch["id"]]
            yield pd.DataFrame(rows)

    def gen_pdf_batch(it):
        for pdf_batch in it:
            rows = []
            for i in pdf_batch["id"]:
                rows.extend(gen_doc(int(i), seed)[1])
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {f.name: [] for f in PDF_ELEMENT.fields})

    def gen_exp_batch(it):
        for pdf_batch in it:
            rows = [gen_doc(int(i), seed)[2] for i in pdf_batch["id"]]
            yield pd.DataFrame(rows)

    from pyspark.sql.types import StructField, StructType

    expected_schema = StructType(
        [StructField("doc_id", DOCUMENTS_IN["doc_id"].dataType, False),
         StructField("spans", DOCUMENTS_IN["spans"].dataType, False)])

    idx_df.mapInPandas(gen_docs_batch, DOCUMENTS_IN).write.mode(
        "overwrite").parquet(f"{out_dir}/documents_in.parquet")
    idx_df.mapInPandas(gen_pdf_batch, PDF_ELEMENT).write.mode(
        "overwrite").parquet(f"{out_dir}/pdf_elements.parquet")
    idx_df.mapInPandas(gen_exp_batch, expected_schema).write.mode(
        "overwrite").parquet(f"{out_dir}/extracted_expected.parquet")
