"""Entity extraction — deterministic pattern stand-in for the spacy NER
tier (reference EntityExtractor, extract_objects.py:18-40: spacy ents ->
groupby(label).entity.apply(list)).

spacy is not in this sandbox; these typed regex extractors keep the
OPERATOR CONTRACT (same output shape: (doc_id, label, entity) rows and
the grouped label -> list form) with dependency-free, oracle-checkable
patterns written to the common Java-regex/RE2 subset.  A real NER model
drops in through operators/modelplug.classify_with_model's batched
shape — the same swap-in story as the classifier tier.  Relationship /
coreference extraction stays a declared non-goal (needs a parser).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# label -> extraction regex (ordered; a span may match several labels —
# deterministic on both engines, disjointness is the real model's job)
ENTITY_PATTERNS: list[tuple[str, str]] = [
    ("NAME", r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)+\b"),
    ("DATE", r"\b\d{4}-\d{2}-\d{2}\b"),
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("URL", r"https?://[^\s]+"),
    ("MONEY", r"\$\d+(?:\.\d{2})?"),
]


def extract_entities(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, label, entity) rows — one row per match occurrence, in
    no particular order (the reference collects spacy ents the same
    way).  Pure Spark SQL: per-label regexp_extract_all + posexplode."""
    parts = [
        df.select(
            F.col(id_col).alias("doc_id"),
            F.lit(label).alias("label"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
            ).alias("entity"),
        )
        for label, pat in ENTITY_PATTERNS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def entities_grouped(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """The reference's grouped form (extract_objects.py:35-40:
    groupby(label).entity.apply(list)) — per (doc, label) a sorted
    DISTINCT entity list (sorted for cross-engine determinism)."""
    return (
        extract_entities(df, text_col, id_col)
        .groupBy("doc_id", "label")
        .agg(F.array_sort(F.array_distinct(
            F.collect_list("entity"))).alias("entities"))
    )


def entities_sql(expr: str) -> str:
    """DuckDB twin of extract_entities over the documents view (rows
    form).  regexp_extract_all + unnest per label, UNION ALL."""
    parts = [
        f"SELECT doc_id, '{label}' AS label, "
        f"unnest(regexp_extract_all({expr}, '{pat}')) AS entity "
        "FROM documents"
        for label, pat in ENTITY_PATTERNS
    ]
    return " UNION ALL ".join(parts)
