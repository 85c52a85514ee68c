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
