"""Glyph-level rasterization: a deterministic pixel FONT whose glyphs
an analytic OCR can decode back to text — closing the reference's
pdf -> render -> OCR -> text loop (pdf_utils.py:151-161 renders real
pixels; extract_ocr.py:21-52 reads them back) without a font stack or
tesseract in the sandbox.

Design (public, from scratch): each printable-ASCII glyph is a CELL —
the char's advance-wide, font-size-tall box — subdivided into a
5-column x 2-row block grid:

  column 0 (both rows)      ANCHOR: always dark.  Every glyph therefore
                            spans its full cell height (line bands
                            detected by row projection equal the cell
                            height exactly) and marks the cell pitch.
  columns 1-4, rows 0-1     8 data blocks; block i dark iff bit i of
                            ord(ch) is set (7 bits cover ASCII 32-126,
                            block 7 carries ord bit 7 = always 0).

Space cells paint nothing (the pdf Char emitter already skips spaces —
a glyph advance with no box), so the decoder reads a light cell as ' '.

The decoder needs NO side channel: line bands come from the row
projection of pure-black pixels (glyph ink is level 0; box-level
text/graphic paint uses 64/128 so the two rasterizer modes can't be
confused), the cell pitch from the band height under the 0.5-em
fixture advance dialect (cell width = height/2 — the decoder contract
is the monospaced fixture dialect; AFM/embedded-width PDFs have
per-char pitches and stay on the box-level raster), and cell
boundaries from the leftmost dark column.  Painter and decoder share
cell_block_boxes so integer rounding of block edges can never
disagree.
"""

from __future__ import annotations

import numpy as np

GLYPH_COLS = 5  # column 0 = anchor, 1-4 = data
GLYPH_ROWS = 2
GLYPH_INK = 0  # pure black; box-raster text/graphics are 64/128


def cell_block_boxes(x0: int, x1: int, y0: int, y1: int):
    """The 10 block pixel boxes of one glyph cell, row-major
    ((row, col) -> (bx0, bx1, by0, by1), half-open).  Integer edges by
    proportional rounding — the single source of truth for both the
    painter and the decoder."""
    xs = [x0 + round(i * (x1 - x0) / GLYPH_COLS)
          for i in range(GLYPH_COLS + 1)]
    ys = [y0 + round(j * (y1 - y0) / GLYPH_ROWS)
          for j in range(GLYPH_ROWS + 1)]
    return [
        (xs[c], xs[c + 1], ys[r], ys[r + 1])
        for r in range(GLYPH_ROWS)
        for c in range(GLYPH_COLS)
    ]


def _dark_blocks(code: int):
    """Block indices (into cell_block_boxes order) to paint for a char
    code: the anchor column + one data block per set bit."""
    dark = [0, GLYPH_COLS]  # anchor: (row 0, col 0) and (row 1, col 0)
    for bit in range(8):
        if code & (1 << bit):
            r, c = divmod(bit, GLYPH_COLS - 1)
            dark.append(r * GLYPH_COLS + (c + 1))
    return dark


def paint_glyph(px: np.ndarray, code: int,
                x0: int, x1: int, y0: int, y1: int) -> None:
    """Paint one glyph cell into a HxWx3 uint8 raster (top-origin
    pixel coords)."""
    boxes = cell_block_boxes(x0, x1, y0, y1)
    for i in _dark_blocks(code):
        bx0, bx1, by0, by1 = boxes[i]
        px[by0:by1, bx0:bx1] = GLYPH_INK


def _read_cell(mask: np.ndarray, x0: int, x1: int,
               y0: int, y1: int) -> str | None:
    """One cell -> decoded char: sample each block's center pixel.
    Light anchor -> None (a space cell)."""
    boxes = cell_block_boxes(x0, x1, y0, y1)

    def center_dark(i):
        bx0, bx1, by0, by1 = boxes[i]
        return bool(mask[(by0 + by1) // 2, (bx0 + bx1) // 2])

    if not (center_dark(0) and center_dark(GLYPH_COLS)):
        return None
    code = 0
    for bit in range(8):
        r, c = divmod(bit, GLYPH_COLS - 1)
        if center_dark(r * GLYPH_COLS + (c + 1)):
            code |= 1 << bit
    return chr(code)


def decode_glyph_page(px: np.ndarray) -> list[tuple[int, str]]:
    """Analytic OCR over one glyph-rendered page raster: -> [(band_top
    pixel row, text)] top-to-bottom.  Row projection of GLYPH_INK
    pixels finds line bands; within a band the pitch is height/2 (the
    0.5-em fixture advance), cells run from the leftmost dark column
    to the last dark cell, light cells decode as spaces."""
    mask = px[:, :, 0] == GLYPH_INK if px.ndim == 3 else px == GLYPH_INK
    rows_any = mask.any(axis=1)
    lines: list[tuple[int, str]] = []
    h = len(rows_any)
    r = 0
    while r < h:
        if not rows_any[r]:
            r += 1
            continue
        top = r
        while r < h and rows_any[r]:
            r += 1
        bot = r
        pitch = max((bot - top) // 2, 1)
        cols = np.nonzero(mask[top:bot].any(axis=0))[0]
        x_start, x_end = int(cols[0]), int(cols[-1]) + 1
        n_cells = max(int(round((x_end - x_start) / pitch)), 1)
        chars = []
        for k in range(n_cells):
            cx0 = x_start + k * pitch
            ch = _read_cell(mask, cx0, cx0 + pitch, top, bot)
            chars.append(" " if ch is None else ch)
        lines.append((top, "".join(chars).rstrip()))
    return lines
