"""Unit tests for text-only (unruled) table grid detection — no Spark."""

import numpy as np

from pydoxtools_spark.functions.textonly_tables import detect_text_only_grid


def _line(x, y, w=60.0, h=10.0):
    return [x, y, x + w, y + h]


def test_detects_aligned_grid():
    # 3 rows x 2 cols, y-aligned rows at y=100/80/60, cols at x=50/200
    boxes, texts = [], []
    for r, y in enumerate([100.0, 80.0, 60.0]):
        for c, x in enumerate([50.0, 200.0]):
            boxes.append(_line(x, y))
            texts.append(f"r{r}c{c}")
    grid = detect_text_only_grid(np.array(boxes), texts)
    assert grid == [["r0c0", "r0c1"], ["r1c0", "r1c1"], ["r2c0", "r2c1"]]


def test_rejects_two_column_prose():
    # two prose columns: y positions independent per column
    boxes, texts = [], []
    for i, y in enumerate([100.0, 88.0, 76.0, 64.0]):
        boxes.append(_line(50.0, y)); texts.append(f"left{i}")
    for i, y in enumerate([97.0, 83.0, 70.0, 58.0]):
        boxes.append(_line(300.0, y)); texts.append(f"right{i}")
    assert detect_text_only_grid(np.array(boxes), texts) is None


def test_rejects_single_column():
    boxes = [_line(50.0, 100.0 - 14 * i) for i in range(5)]
    texts = [f"l{i}" for i in range(5)]
    assert detect_text_only_grid(np.array(boxes), texts) is None


def test_merges_multiline_cell():
    boxes = [_line(50, 100), _line(200, 100), _line(50, 80),
             _line(200, 80), _line(260, 80)]
    texts = ["a", "b", "c", "d1", "d2"]
    grid = detect_text_only_grid(np.array(boxes), texts, col_tol=80.0)
    assert grid == [["a", "b"], ["c", "d1 d2"]]


def test_textonly_spark_operator_routes_and_skips(spark):
    """Spark-level contract: graphics pages are skipped (they belong to
    the ruled routed kernel), aligned pages detect, prose rejects."""
    from pydoxtools_spark.operators.pdf_relational import (
        textonly_tables_from_elements,
    )

    rows = []
    # page 1: aligned 2x2 grid
    for r, y in enumerate([700.0, 680.0]):
        for c, x in enumerate([50.0, 200.0]):
            rows.append(("d1", 1, "Text", x, y - 10, x + 60, y, f"r{r}c{c}"))
    # page 2: same grid + one graphic rule -> skipped
    for r, y in enumerate([700.0, 680.0]):
        for c, x in enumerate([50.0, 200.0]):
            rows.append(("d1", 2, "Text", x, y - 10, x + 60, y, f"g{r}{c}"))
    rows.append(("d1", 2, "Graphic", 40.0, 660.0, 280.0, 710.0, None))
    df = spark.createDataFrame(
        rows,
        "doc_id string, p_num int, type string, x0 double, y0 double,"
        " x1 double, y1 double, rawtext string",
    )
    out = textonly_tables_from_elements(df).collect()
    assert len(out) == 1
    (row,) = out
    assert row["p_num"] == 1
    assert row["text"] == "r0c0 | r0c1\nr1c0 | r1c1"
    assert (row["x0"], row["y1"]) == (50.0, 700.0)
