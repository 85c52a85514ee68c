"""Full-fidelity table extraction from char-level elements — the
reference's word-rebuild + sweep-line + grid pipeline, re-expressed in
numpy/pandas as ONE shared per-page kernel used by BOTH the Spark
applyInPandas table kernel and the single-process oracle (span equality
by construction).

Stages (reference citations, behavior parity NOT code copies):
  1. words_from_chars     — rebuild word boxes from raw chars via
                            pairwise txtbox distance (max(y-misalign/4,
                            x-gap/2)) clustered at threshold 1.0
                            (extract_tables.py:351-386,
                            cluster_utils.py:450-476)
  2. sweep_line_cells     — bottom-to-top y-scan alternating text rows
                            and graphic rows: open cells at vertical-
                            edge x-splits (min_cell_width 6.0), close
                            them at the next horizontal line
                            (extract_tables.py:151-238, 400-553)
  3. cells_to_grid        — cluster1D cell borders (tol 7.0), interval
                            containment (cells thinned by ±5), meshgrid
                            SPANNING cells exploded over every covered
                            grid position, 'first'-wins pivot
                            (extract_tables.py:127-132, 555-608)
  4. is_valid_table_tree  — the FROZEN offline-trained decision tree,
                            thresholds verbatim (extract_tables.py:
                            714-761; constants VALID_TABLE_T1/T2)
  5. extract_page_tables_full — area candidates (shared multilevel
                            clustering from functions/pdflayout) ->
                            per-candidate stages 1-4 -> valid tables
                            (extract_tables.py:952-1096)

Everything here is per-page work on tens of rows; the Spark row-level
contract (no per-row Python) is preserved because this runs inside an
Arrow-batched applyInPandas kernel over (doc_id, page_bucket) groups.
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    CELL_IDX_TOL,
    CELL_SORT_Y_WEIGHT,
    CELL_TEXT_TOLERANCE,
    ELEM_SCAN_TOL,
    MAX_CHAR_DISALIGNMENT,
    MAX_CHAR_DIST,
    MAX_V_LINE_THICKNESS,
    MIN_CELL_WIDTH,
    MIN_NEW_LINE_GAP,
    TEXT_EXTRACTION_MARGIN,
    VALID_TABLE_T1,
    VALID_TABLE_T2,
    WORD_CLUSTER_THRESHOLD,
)
from .pdflayout import _cluster_1d, _union_find_cluster, detect_table_area_boxes

# ------------------------------------------------------------------ words


def line_chars_to_text(texts: list[str], sizes: list[float] | None = None,
                       size_hints: bool = False) -> str:
    """_line2txt (extract_textstructure.py:19-42): join char texts; with
    size_hints, insert '<s>' before a char whose font size DROPS vs the
    previous char and '</s>' when it rises (first char never hinted).
    Hints are opt-in exactly like the reference — its own df_words path
    calls _line2txt with the default (no hints)."""
    if not size_hints or sizes is None:
        return "".join(texts)
    out = []
    last = 0.0
    for i, (t, sz) in enumerate(zip(texts, sizes)):
        hint = ""
        if i > 0:
            if sz < last:
                hint = "<s>"
            elif sz > last:
                hint = "</s>"
        last = sz
        out.append(hint + t)
    return "".join(out)


def words_from_chars(
    boxes: np.ndarray, texts: list[str],
    sizes: list[float] | None = None, size_hints: bool = False,
) -> tuple[np.ndarray, list[str]]:
    """Char boxes (n,4) + char texts -> word boxes + word texts.

    Distance between two chars = max(vertical-misalignment / 4.0,
    x-gap / 2.0) (pairwise_txtbox_dist, cluster_utils.py:450-476);
    single-linkage clusters at strict < 1.0 (max_word_distance,
    extract_tables.py:367).  Word text = chars sorted by x0
    (extract_tables.py:381), stripped."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0, 4)), []
    # vertical misalignment: bbox y-length minus the longer char's
    # y-length, clipped at 0 (pairwise_box_alignement_along_axis axis=0)
    ly = boxes[:, 3] - boxes[:, 1]
    y_span = (
        np.maximum(boxes[:, 3][:, None], boxes[:, 3][None, :])
        - np.minimum(boxes[:, 1][:, None], boxes[:, 1][None, :])
    )
    d_al = np.maximum(0.0, y_span - np.maximum(ly[:, None], ly[None, :]))
    # horizontal gap, clipped at 0
    lx = boxes[:, 2] - boxes[:, 0]
    x_span = (
        np.maximum(boxes[:, 2][:, None], boxes[:, 2][None, :])
        - np.minimum(boxes[:, 0][:, None], boxes[:, 0][None, :])
    )
    d_gap = np.maximum(0.0, x_span - lx[:, None] - lx[None, :])
    dist = np.maximum(d_al / MAX_CHAR_DISALIGNMENT, d_gap / MAX_CHAR_DIST)

    labels = _union_find_cluster(dist < WORD_CLUSTER_THRESHOLD)
    wboxes, wtexts = [], []
    for lab in np.unique(labels):
        m = labels == lab
        g = boxes[m]
        order = np.nonzero(m)[0][np.argsort(g[:, 0], kind="stable")]
        txt = line_chars_to_text(
            [texts[i] for i in order],
            [sizes[i] for i in order] if sizes is not None else None,
            size_hints,
        ).strip()
        wboxes.append((g[:, 0].min(), g[:, 1].min(), g[:, 2].max(), g[:, 3].max()))
        wtexts.append(txt)
    return np.array(wboxes, dtype=float), wtexts


# ------------------------------------------------------------- sweep line


def _cell_words(words: np.ndarray, wtexts: list[str], cell: dict) -> list[int]:
    """Word indices fully inside the cell ±text_line_tol
    (_close_cell, extract_tables.py:193-210: y0 >= cell.y0-tol,
    x0 >= cell.x0-tol, y1 <= cell.y1+tol, x1 <= cell.x1+tol)."""
    t = CELL_TEXT_TOLERANCE
    m = (
        (words[:, 1] >= cell["y0"] - t)
        & (words[:, 0] >= cell["x0"] - t)
        & (words[:, 3] <= cell["y1"] + t)
        & (words[:, 2] <= cell["x1"] + t)
    )
    return np.nonzero(m)[0].tolist()


def _close_cell(oc: dict, y1: float, words: np.ndarray, wtexts: list[str]):
    oc = dict(oc, y1=y1)
    idxs = _cell_words(words, wtexts, oc)
    if not idxs:
        return None  # textless cells are discarded (extract_tables.py:206)
    oc["word_idx"] = idxs
    return oc


def _horizontal_row(ge: np.ndarray, y0_cursor: float):
    """get_horizontal_row_elements (extract_tables.py:151-190): the next
    horizontal border above the cursor + the h-line segments there.
    Returns (y0_h_elem, [(x0, x1)]) or None."""
    over = ge[ge[:, 3] >= y0_cursor]  # elements ending above the cursor
    if len(over) == 0:
        return None
    over = over[np.lexsort((over[:, 2], over[:, 0], over[:, 3], over[:, 1]))]
    above = over[over[:, 1] >= y0_cursor]  # elements starting above too
    next_elem = over[0]
    y_h = next_elem[3] if len(above) == 0 else min(next_elem[3], above[0][1])
    in_band = over[
        (over[:, 1] <= y_h + MAX_V_LINE_THICKNESS)
        & (over[:, 3] >= y_h - ELEM_SCAN_TOL)
        & (over[:, 2] - over[:, 0] > MIN_CELL_WIDTH)
    ]
    # line candidates: the element's y0 edge and y1 edge, each kept when
    # it lies in the band; dedup on (x0, x1)
    segs = set()
    for x0, y0, x1, y1 in in_band:
        if y_h - ELEM_SCAN_TOL <= y0 <= y_h + MAX_V_LINE_THICKNESS:
            segs.add((x0, x1))
        if y_h - ELEM_SCAN_TOL <= y1 <= y_h + MAX_V_LINE_THICKNESS:
            segs.add((x0, x1))
    return y_h, sorted(segs)


def sweep_line_cells(
    ge: np.ndarray,
    words: np.ndarray,
    wtexts: list[str],
    bbox: tuple[float, float, float, float],
    max_steps: int = 1000,
) -> list[dict]:
    """Bottom-to-top sweep (detect_cells, extract_tables.py:400-553).
    ge: graphic boxes (n,4) inside the candidate area; words/wtexts: the
    rebuilt words.  Returns closed cells [{x0,y0,x1,y1,word_idx}]."""
    if len(ge) == 0 or len(words) == 0:
        return []
    y_means = sorted(set(((words[:, 1] + words[:, 3]) / 2.0).tolist()), reverse=True)
    # pop() takes the smallest (bottom) first
    open_cells: list[dict] = []
    cells: list[dict] = []
    y0_h_elem = 0.0

    for _ in range(max_steps):
        if not y_means:
            # top of the table: close whatever is still open at bbox y1
            for oc in open_cells:
                if c := _close_cell(oc, bbox[3], words, wtexts):
                    cells.append(c)
            break
        y0_cursor = y0_h_elem
        while y_means:
            y0_cursor = y_means.pop()
            if y0_cursor > y0_h_elem:
                break
        # vertical edges crossing the cursor line
        crossing = ge[
            (ge[:, 1] <= y0_cursor + ELEM_SCAN_TOL)
            & (ge[:, 3] >= y0_cursor + ELEM_SCAN_TOL)
        ]
        if len(crossing) == 0:
            if y_means:
                y0_h_elem = (y0_cursor + y_means[-1]) / 2.0
            continue
        vlines = np.sort(
            np.hstack(
                (np.unique(crossing[:, [0, 2]].ravel()), [bbox[0], bbox[2]])
            )
        )
        x0_cursor = vlines[0]
        for x in vlines:
            if x < x0_cursor + MIN_CELL_WIDTH:
                x0_cursor = x
                continue
            if not any(
                oc["x0"] <= x0_cursor + ELEM_SCAN_TOL <= oc["x1"]
                for oc in open_cells
            ):
                open_cells.append({"x0": x0_cursor, "y0": y0_h_elem, "x1": x})
            x0_cursor = x
        res = _horizontal_row(ge, y0_cursor)
        if res is None:
            continue
        y0_h_elem, h_lines = res
        still_open = []
        for oc in open_cells:
            # a top border line overlapping the cell horizontally?
            if any(
                s0 <= oc["x1"] - ELEM_SCAN_TOL and s1 >= oc["x0"] + ELEM_SCAN_TOL
                for s0, s1 in h_lines
            ):
                if c := _close_cell(oc, y0_h_elem, words, wtexts):
                    cells.append(c)
            else:
                still_open.append(oc)
        open_cells = still_open
    return cells


# ------------------------------------------------------------------- grid


def _cell_text(word_idx: list[int], words: np.ndarray, wtexts: list[str]) -> str:
    """_get_cell_text (extract_tables.py:115-123): sortkey x0 - 40*y0,
    newline where the next word's y0 drops by more than 4."""
    sk = words[word_idx, 0] - CELL_SORT_Y_WEIGHT * words[word_idx, 1]
    order = np.argsort(sk, kind="stable")
    ordered = [word_idx[i] for i in order]
    out = []
    prev_y0 = None
    for wi in ordered:
        y0 = words[wi, 1]
        if prev_y0 is not None:
            out.append("\n" if (y0 - prev_y0) < -MIN_NEW_LINE_GAP else " ")
        out.append(wtexts[wi])
        prev_y0 = y0
    return "".join(out)


def _interval_indices(edges: np.ndarray, lines: np.ndarray) -> list[np.ndarray]:
    """_get_cell_coordinates (extract_tables.py:127-132): per cell, the
    grid intervals it covers after thinning by ±tol."""
    c0 = edges[:, 0] + CELL_IDX_TOL
    c1 = edges[:, 1] - CELL_IDX_TOL
    hit = (c0[:, None] < lines[None, 1:]) & (c1[:, None] > lines[None, :-1])
    return [np.nonzero(hit[i])[0] for i in range(len(edges))]


def cells_to_grid(cells: list[dict], words: np.ndarray, wtexts: list[str]):
    """Closed cells -> (grid rows-top-down, hlines, vlines, span_count)
    or None when the candidate does not raster cleanly
    (convert_cells_to_df, extract_tables.py:555-608: reject when any
    cell covers no interval on either axis)."""
    if len(cells) < 2:
        return None
    x_edges = np.array([(c["x0"], c["x1"]) for c in cells], dtype=float)
    y_edges = np.array([(c["y0"], c["y1"]) for c in cells], dtype=float)
    from ..constants import CELL_BORDER_TOLERANCE

    vlines = _cluster_1d(x_edges.ravel(), CELL_BORDER_TOLERANCE)
    hlines = _cluster_1d(y_edges.ravel(), CELL_BORDER_TOLERANCE)
    xtcs = _interval_indices(x_edges, vlines)
    ytcs = _interval_indices(y_edges, hlines)
    if any(len(t) == 0 for t in xtcs) or any(len(t) == 0 for t in ytcs):
        return None
    # meshgrid explode: a spanning cell repeats its text at every
    # covered (x, y) grid position; 'first' cell in candidate order
    # wins a contested position (extract_tables.py:601-606)
    texts = [_cell_text(c["word_idx"], words, wtexts) for c in cells]
    pos: dict[tuple[int, int], str] = {}
    span_count = 0
    for ci, (xtc, ytc) in enumerate(zip(xtcs, ytcs)):
        if len(xtc) * len(ytc) > 1:
            span_count += 1
        for yi in ytc:
            for xi in xtc:
                pos.setdefault((int(yi), int(xi)), texts[ci])
    ys = sorted({k[0] for k in pos}, reverse=True)  # top row first
    xs = sorted({k[1] for k in pos})
    grid = [[pos.get((y, x), "") for x in xs] for y in ys]
    return grid, hlines, vlines, span_count


# --------------------------------------------------------------- validity


def is_valid_table_tree(
    vlines_num: int,
    cells_detected_num: int,
    cells_span_num: int,
    cells_num: int,
    words_area_sum: float,
    h: float,
) -> bool:
    """The FROZEN decision tree (extract_tables.py:752-758), thresholds
    verbatim from constants.VALID_TABLE_T1/T2."""
    if cells_detected_num == 0 or cells_num == 0 or h == 0:
        return False
    f1 = vlines_num / cells_detected_num + cells_span_num / cells_detected_num
    if f1 <= VALID_TABLE_T1:
        return (words_area_sum / h - h / cells_num) > VALID_TABLE_T2
    return False


# ------------------------------------------------------------ page driver


def _inside(boxes: np.ndarray, area, tol: float) -> np.ndarray:
    """boundarybox_query containment mask (cluster_utils.py:636-657:
    strict > / < against area ± tol)."""
    ax0, ay0, ax1, ay1 = area
    return (
        (boxes[:, 1] > ay0 - tol)
        & (boxes[:, 3] < ay1 + tol)
        & (boxes[:, 0] > ax0 - tol)
        & (boxes[:, 2] < ax1 + tol)
    )


def extract_page_tables_full(
    graphics: np.ndarray,
    char_boxes: np.ndarray,
    char_texts: list[str],
) -> list[tuple[tuple[float, float, float, float], list[list[str]]]]:
    """ONE page's graphics + chars -> [(table_bbox, grid)] for VALID
    tables, candidates in top-to-bottom order.  This is the full
    reference pipeline: multilevel area candidates -> per-candidate
    word rebuild -> sweep-line cells -> spanning grid -> frozen
    validity tree."""
    out = []
    for ax0, ay0, ax1, ay1, cb in detect_table_area_boxes(graphics):
        area = (ax0, ay0, ax1, ay1)
        ge = cb[_inside(cb, area, TEXT_EXTRACTION_MARGIN)]
        if len(char_boxes):
            cm = _inside(char_boxes, area, TEXT_EXTRACTION_MARGIN)
            ch = char_boxes[cm]
            ct = [char_texts[i] for i in np.nonzero(cm)[0]]
        else:
            ch, ct = np.zeros((0, 4)), []
        words, wtexts = words_from_chars(ch, ct)
        if len(words) == 0:
            continue  # df_le empty -> invalid (extract_tables.py:719)
        # exact table bbox = words ∪ graphics extents (extract_tables.py:388-398)
        allb = np.vstack([words, ge]) if len(ge) else words
        bbox = (
            float(allb[:, 0].min()), float(allb[:, 1].min()),
            float(allb[:, 2].max()), float(allb[:, 3].max()),
        )
        cells = sweep_line_cells(ge, words, wtexts, bbox)
        res = cells_to_grid(cells, words, wtexts)
        if res is None:
            continue  # raster rejection == df.size <= 1 path
        grid, hlines, vlines, span_count = res
        if len(grid) * len(grid[0]) <= 1:
            continue
        wa = words[:, 2] - words[:, 0]
        wh = words[:, 3] - words[:, 1]
        valid = is_valid_table_tree(
            vlines_num=len(vlines),
            cells_detected_num=len(cells),
            cells_span_num=span_count,
            cells_num=len(grid) * len(grid[0]),
            words_area_sum=float((wa * wh).sum()),
            h=bbox[3] - bbox[1],
        )
        if valid:
            out.append((bbox, grid))
    return out
