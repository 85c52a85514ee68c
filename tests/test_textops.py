import pytest
from pyspark.sql import functions as F

from pydoxtools_spark.operators import textops
from pydoxtools_spark.schemas import DOCUMENTS_IN


def test_full_text(spark):
    rows = [{"doc_id": "d", "spans": [
        {"kind": "header", "text": "Title", "media_ref": None, "offset": 0},
        {"kind": "text", "text": "para one", "media_ref": None, "offset": 5},
        {"kind": "image", "text": None, "media_ref": "m", "offset": 13},
        {"kind": "text", "text": "para two", "media_ref": None, "offset": 13},
    ]}]
    df = spark.createDataFrame(rows, schema=DOCUMENTS_IN)
    out = textops.full_text(df).collect()[0]["full_text"]
    assert out == "Title\n\npara one\n\npara two"


def test_sections_extract(spark):
    rows = [
        ("d1", 0, "intro text", ["intro", "all"]),
        ("d1", 1, "body text", ["all"]),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "boxnum", "rawtext", "sections"])
    got = {r["section"]: r for r in textops.sections_extract(df).collect()}
    assert got["intro"]["section_text"] == "intro text"
    assert got["all"]["section_text"] == "intro text\n\nbody text"
    assert got["all"]["first_box"] == 0


def test_detect_list_lines(spark):
    df = spark.createDataFrame(
        [("a", "- item one"), ("b", "* item two"), ("c", "plain"),
         ("d", "• bullet"), ("e", "-5° angle")],
        ["id", "rawtext"])
    got = {r["id"] for r in textops.detect_list_lines(df).collect()}
    assert got == {"a", "b", "d"}  # degree-symbol line excluded


def test_bbox_query_and_area_context(spark):
    el = spark.createDataFrame(
        [("d", 0, 10.0, 10.0, 20.0, 20.0, "inside"),
         ("d", 0, 35.0, 35.0, 45.0, 45.0, "context"),
         ("d", 0, 200.0, 200.0, 210.0, 210.0, "far")],
        ["doc_id", "p_num", "x0", "y0", "x1", "y1", "tag"])
    inside = textops.bbox_query(el, 0, 0, 30, 30)
    assert [r["tag"] for r in inside.collect()] == ["inside"]
    outside = textops.bbox_query(el, 0, 0, 30, 30, exclude=True)
    assert {r["tag"] for r in outside.collect()} == {"context", "far"}

    areas = spark.createDataFrame(
        [("d", 0, 0, 0.0, 0.0, 30.0, 30.0)],
        ["doc_id", "p_num", "area_id", "ax0", "ay0", "ax1", "ay1"])
    ctx = textops.area_context(el, areas, margin=40.0)
    assert [r["tag"] for r in ctx.collect()] == ["context"]


def test_num_sents_and_merges(spark):
    df = spark.createDataFrame(
        [("a", "One. Two! Three? No end"),
         ("b", "no punctuation at all")], ["id", "t"])
    got = {r["id"]: r["n"] for r in df.select(
        "id", textops.num_sents(F.col("t")).alias("n")).collect()}
    assert got == {"a": 3, "b": 1}

    kw = spark.createDataFrame([(["a", "b"], ["b", "c"])], ["k1", "k2"])
    merged = kw.select(textops.merge_keywords(F.col("k1"), F.col("k2")).alias("m"))
    assert sorted(merged.collect()[0]["m"]) == ["a", "b", "c"]

    mm = spark.createDataFrame(
        [({"x": "1", "y": "2"}, {"y": "9", "z": "3"})], ["m1", "m2"])
    out = mm.select(textops.merge_meta(F.col("m1"), F.col("m2")).alias("m")).collect()[0]["m"]
    assert out == {"x": "1", "y": "9", "z": "3"}


def test_text_pieces_property_reassembly(spark):
    """Property: pieces joined in order reconstruct the word stream, and
    every piece starts at a word whose running offset crosses a target
    boundary (hypothesis over word-length profiles)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pydoxtools_spark.operators.textstats import text_pieces

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=12),
                    min_size=1, max_size=60))
    def check(lens):
        words = [chr(97 + i % 26) * n for i, n in enumerate(lens)]
        text = " ".join(words)
        df = spark.createDataFrame([("d", text)], ["doc_id", "text"])
        rows = text_pieces(df, "text", target=30).orderBy("piece").collect()
        assert " ".join(r["piece_text"] for r in rows) == text
        # piece index = floor(exclusive running offset / target)
        off = 0
        expect = {}
        for w in words:
            expect.setdefault(off // 30, []).append(w)
            off += len(w) + 1
        assert {r["piece"]: r["piece_text"].split(" ") for r in rows} == expect

    check()


def test_bbox_intersect_query_overlap_semantics(spark):
    """boundarybox_intersection_query (cluster_utils.py:660-675):
    overlap, not containment — a box straddling the query edge is
    returned; a fully-outside box is not; strict comparisons at the
    tol boundary."""
    from pydoxtools_spark.operators.textops import bbox_intersect_query

    rows = [
        ("in", 150.0, 150.0, 200.0, 200.0),        # fully inside
        ("straddle", 50.0, 150.0, 150.0, 200.0),   # crosses left edge
        ("outside", 500.0, 600.0, 550.0, 650.0),   # disjoint
        ("edge", 399.0, 150.0, 401.0, 200.0),      # crosses right edge
        ("at_tol", 401.0, 150.0, 450.0, 200.0),    # x0 == x1+tol: strict < fails
    ]
    df = spark.createDataFrame(rows, ["id", "x0", "y0", "x1", "y1"])
    got = {r["id"] for r in
           bbox_intersect_query(df, 100.0, 100.0, 400.0, 500.0, tol=1.0).collect()}
    assert got == {"in", "straddle", "edge"}
