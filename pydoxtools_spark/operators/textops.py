"""Text-structure operators over spans/elements tables — the remaining
SURVEY.md §2.4/§2.6/§2.8 relational pieces, all pure Spark SQL.

| reference                                   | here              |
|---------------------------------------------|-------------------|
| full_text = '\\n\\n'.join(text boxes)
|   (document.py:227-229)                     | full_text         |
| SectionsExtractor: explode sections, concat
|   by min boxnum (extract_textstructure.py:161-169) | sections_extract |
| ListExtractor regex (extract_tables.py:241-254) | detect_list_lines |
| boundarybox_query containment
|   (cluster_utils.py:636-657)                | bbox_query        |
| get_area_context (extract_textstructure.py:283-318) | area_context |
| num_sents (document.py:383-391, spacy-free
|   approximation)                            | num_sents         |
| keyword aggregation (document.py:266-274)   | merge_keywords    |
| meta merge (document.py:375-380)            | merge_meta        |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..constants import LIST_CHAR_REGEX, PARAGRAPH_JOIN


def full_text(extracted: DataFrame, kinds: tuple[str, ...] = ("text", "header")) -> DataFrame:
    """(doc_id, spans) -> (doc_id, full_text): text-bearing spans joined
    by blank lines in reading order (reference full_text semantics)."""
    kinds_sql = ", ".join(f"'{k}'" for k in kinds)
    sql = (
        "array_join(transform(filter(spans, x -> x.kind IN (" + kinds_sql
        + ")), x -> x.text), '\\n\\n')"
    )
    return extracted.select("doc_id", F.expr(sql).alias("full_text"))


def sections_extract(elements: DataFrame) -> DataFrame:
    """Elements with a `sections: array<string>` column -> one row per
    (doc_id, section) with rawtext concatenated in element order and
    the section's first position — the reference's SectionsExtractor
    as explode + hash-agg."""
    ex = elements.select(
        "doc_id", "boxnum", "rawtext", F.explode("sections").alias("section")
    )
    return (
        ex.groupBy("doc_id", "section")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("boxnum", F.col("rawtext").alias("t")))
                    ),
                    lambda x: x["t"],
                ),
                PARAGRAPH_JOIN,
            ).alias("section_text"),
            F.min("boxnum").alias("first_box"),
        )
    )


def detect_list_lines(elements: DataFrame, text_col: str = "rawtext") -> DataFrame:
    """Lines starting with list markers (-, *, bullets; degree-symbol
    lookahead excluded) — the reference's ListExtractor as one rlike."""
    return elements.filter(F.col(text_col).rlike(LIST_CHAR_REGEX))


def bbox_query(elements: DataFrame, x0: float, y0: float, x1: float, y1: float,
               tol: float = 0.0, exclude: bool = False) -> DataFrame:
    """Containment filter: elements fully inside bbox±tol (or fully
    outside with exclude=True) — boundarybox_query as a boolean mask."""
    inside = (
        (F.col("x0") >= x0 - tol) & (F.col("x1") <= x1 + tol)
        & (F.col("y0") >= y0 - tol) & (F.col("y1") <= y1 + tol)
    )
    return elements.filter(~inside if exclude else inside)


def bbox_intersect_query(elements: DataFrame, x0: float, y0: float,
                         x1: float, y1: float, tol: float = 1.0) -> DataFrame:
    """Overlap filter — boundarybox_intersection_query
    (cluster_utils.py:660-675): elements whose box INTERSECTS bbox±tol,
    strict > / < exactly like the reference's .loc chain."""
    inter = (
        (F.col("y1") > y0 - tol) & (F.col("y0") < y1 + tol)
        & (F.col("x1") > x0 - tol) & (F.col("x0") < x1 + tol)
    )
    return elements.filter(inter)


def area_context(elements: DataFrame, areas: DataFrame,
                 margin: float = 40.0) -> DataFrame:
    """Context around areas: elements within area bbox+margin but NOT
    inside the area itself — reference get_area_context as a banded
    range join on (doc_id, p_num).  `areas` columns: doc_id, p_num,
    area_id, ax0, ay0, ax1, ay1."""
    j = elements.join(areas, ["doc_id", "p_num"])
    in_outer = (
        (F.col("x0") >= F.col("ax0") - margin) & (F.col("x1") <= F.col("ax1") + margin)
        & (F.col("y0") >= F.col("ay0") - margin) & (F.col("y1") <= F.col("ay1") + margin)
    )
    in_inner = (
        (F.col("x0") >= F.col("ax0")) & (F.col("x1") <= F.col("ax1"))
        & (F.col("y0") >= F.col("ay0")) & (F.col("y1") <= F.col("ay1"))
    )
    return j.filter(in_outer & ~in_inner)


def num_sents(col: Column) -> Column:
    """Sentence count approximation: terminal-punctuation runs followed
    by space/end (the reference counts spacy sents; this is the
    dependency-free contract)."""
    return F.greatest(
        F.size(F.regexp_extract_all(col, F.lit(r"[.!?]+(\s|$)"), 0)),
        F.lit(1),
    )


def merge_keywords(*cols: Column) -> Column:
    """set(flatten(a ∪ b)) — reference keyword aggregation
    (document.py:266-274) via array_distinct(concat(...))."""
    return F.array_distinct(F.concat(*cols))


def merge_meta(a: Column, b: Column) -> Column:
    """{**meta_a, **meta_b} with b winning — map_concat semantics with
    duplicate-key resolution to the right operand."""
    return F.map_zip_with(
        a, b, lambda _k, va, vb: F.coalesce(vb, va)
    )
