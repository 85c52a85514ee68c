"""Text-only (unruled) table detection — reference
convert_cells_to_df_text_only (extract_tables.py:610-662): infer a cell
grid from text-line alignment when no graphic rules exist.

Pure numpy per page (plugs into the same applyInPandas kernel slot as
ruled-table detection).  Opt-in: not wired into the default pipeline
because alignment-based detection can false-positive on multi-column
prose; the discriminator below (row-fill ratio) rejects prose, but the
default corpus contract only promises ruled tables.

Algorithm:
  1. cluster line y-centers (tol) -> candidate rows
  2. cluster line x-starts   (tol) -> candidate columns
  3. accept iff >=2 rows, >=2 cols, and mean filled cells per row
     >= MIN_ROW_FILL (prose in k columns y-aligns per column, not per
     row, so its rows have ~1 cell -> rejected)
  4. grid[r][c] = ' '-joined texts of lines in that (row, col) band
"""

from __future__ import annotations

import numpy as np

from .pdflayout import _cluster_1d

ROW_TOL = 5.0
COL_TOL = 10.0
MIN_ROW_FILL = 1.5


def detect_text_only_grid(
    boxes: np.ndarray, texts: list[str],
    row_tol: float = ROW_TOL, col_tol: float = COL_TOL,
) -> list[list[str]] | None:
    """boxes: (n,4) [x0,y0,x1,y1] text lines of ONE candidate region.
    Returns the row-major cell grid (top row first) or None."""
    if len(boxes) < 4:
        return None
    cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
    x0 = boxes[:, 0]

    row_pos = _cluster_1d(cy, row_tol)          # ascending y
    col_pos = _cluster_1d(x0, col_tol)          # ascending x
    nrows, ncols = len(row_pos), len(col_pos)
    if nrows < 2 or ncols < 2:
        return None

    ri = np.abs(cy[:, None] - row_pos[None, :]).argmin(axis=1)
    ci = np.abs(x0[:, None] - col_pos[None, :]).argmin(axis=1)

    filled = len({(int(r), int(c)) for r, c in zip(ri, ci)})
    if filled / nrows < MIN_ROW_FILL:
        return None  # prose-like: ~1 cell per row band

    grid = [["" for _ in range(ncols)] for _ in range(nrows)]
    order = np.lexsort((x0, -cy))  # top-to-bottom, left-to-right
    for i in order:
        r_top = nrows - 1 - int(ri[i])
        c = int(ci[i])
        t = texts[i] or ""
        grid[r_top][c] = (grid[r_top][c] + " " + t).strip() if grid[r_top][c] else t
    return grid
