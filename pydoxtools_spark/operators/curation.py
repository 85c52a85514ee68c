"""Training-data curation operators: PII scrubbing and deterministic
dataset splitting.

Beyond the reference's surface (it extracts; a 100 TB training-data
pipeline also has to sanitize and partition what it extracted) — part
of the first-class LLM-pipeline tier alongside operators/dedup.py.
Everything is pure Spark SQL (JVM regex / md5 — whole-stage codegen,
cross-engine oracle twins below each op).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns are written to the common Java-regex/RE2 subset (no
# backreferences, no lookaround) so the DuckDB twin matches bit-exactly.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
]


def scrub_pii(col: Column) -> Column:
    """Replace emails, IPv4 addresses and phone-like digit runs with
    typed placeholders, in a fixed order (emails first so their digit
    tails can't half-match as phones)."""
    out = col
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def scrub_pii_sql(expr: str) -> str:
    """DuckDB twin: identical patterns, identical application order."""
    out = expr
    for pat, rep in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


def split_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from md5 of the id string —
    stable across runs, partitionings, and engines (first 4 hex chars
    as an int; fixed-width hex parses identically everywhere)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10)
        .cast("int") % buckets
    )


def split_bucket_sql(expr: str, buckets: int = 100) -> str:
    return (f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 4))::INT"
            f" % {buckets})")


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 0,
) -> DataFrame:
    """Hash-split the corpus into train/val(/test) — the standard
    leakage-safe split for training corpora: membership depends only on
    the id, so re-runs, resharding, and incremental appends never move
    a document across splits.  Adds `bucket` and `split` columns."""
    b = split_bucket(F.col(id_col))
    split = (
        F.when(b < val_pct, "val")
        .when(b < val_pct + test_pct, "test")
        .otherwise("train")
    )
    return df.withColumn("bucket", b).withColumn("split", split)


# ------------------------------------------------------- line-level dedup


def drop_repeated_lines(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Within-document repeated-line removal (the C4/RefinedWeb recipe:
    exact duplicate lines inside one document are boilerplate — keep
    the FIRST occurrence, preserve line order).  Blank lines are
    preserved as-is (they are structure, not content).

    Pure Spark SQL: posexplode -> row_number window over
    (doc, trimmed line) -> keep first -> ordered re-assembly.  All
    shuffles key on doc_id, so the operator scales like any per-doc
    window; no Python."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim("line"))
    w = Window.partitionBy("id", "norm").orderBy("pos")
    kept = lines.withColumn(
        "rn", F.when(F.col("norm") == "", F.lit(1)).otherwise(
            F.row_number().over(w))
    ).filter(F.col("rn") == 1)
    return (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col("line").alias("l")))
                    ),
                    lambda x: x["l"],
                ),
                "\n",
            ).alias("clean_text")
        )
        .select(F.col("id").alias(id_col), "clean_text")
    )


def drop_boilerplate_lines(df: DataFrame, min_df: int = 10,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Cross-document boilerplate-line removal: a (trimmed, non-blank)
    line occurring in >= min_df DISTINCT documents is navigation/
    footer/legal boilerplate — removed from every document.

    Scale shape: the line-frequency table is a map-side-combinable
    hash-agg; only lines above the cap join back (broadcast-sized by
    construction — boilerplate is by definition few distinct strings),
    so the corpus streams through one explode + one broadcast
    anti-join, the exact stopword-shingle pattern from
    dedup.ngram_jaccard_pairs."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim("line"))
    freq = (
        lines.filter(F.col("norm") != "")
        .select("id", "norm").distinct()
        .groupBy("norm").agg(F.count("*").alias("df_cnt"))
        .filter(F.col("df_cnt") >= min_df)
    )
    kept = lines.join(
        F.broadcast(freq.select("norm")), "norm", "left_anti")
    return (
        kept.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.col("line").alias("l")))
                    ),
                    lambda x: x["l"],
                ),
                "\n",
            ).alias("clean_text")
        )
        .select(F.col("id").alias(id_col), "clean_text")
    )
