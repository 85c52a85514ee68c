"""Text analysis operators over a document corpus — token counting,
quality scoring, language ID, fingerprinting.

Re-expresses the reference's scalar text functions as pure Spark SQL
(JVM-side, whole-stage codegen — no Python in the hot path):
  - num_words / num_sents / num_pages   (reference document.py:383-391)
  - alpha/digit ratio                   (reference document.py:150-163)
  - language detection w/ 'unknown'
    default                             (reference extract_classes.py:19-26,
                                         document.py:395-398 — langdetect
                                         replaced by a stopword-profile
                                         heuristic, same contract)
  - text piece splitting                (reference extract_index.py:22-73)
  - fingerprint (md5 of normal form)    (reference extract_tables.py:686-689
                                         uses md5 the same way for tables)

Every function returns Column expressions so Catalyst can prune/push
down; `*_sql` twins emit the DuckDB-equivalent SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (  # noqa: F401 (CJK kept for compat)
    CJK_CHAR_CLASS,
    LANGID_CHAR_CLASSES,
    LANGID_STOPWORDS,
    TOKEN_REGEX,
)

# ------------------------------------------------------------- counting


def num_words(col: Column) -> Column:
    """Whitespace word count (reference: len(split())).

    Counted as non-space runs (regexp_extract_all of \\S+) rather than
    size(split(...)): Python str.split() drops empties, so empty /
    whitespace-only text must count 0 words — split-of-'' returns ['']
    (count 1) while \\S+ matches nothing, and the DuckDB twin
    len(regexp_extract_all(text, '\\S+')) agrees identically."""
    return F.size(F.regexp_extract_all(col, F.lit(r"\S+"), 0))


def num_tokens(col: Column) -> Column:
    """BPE-ish token count: words / numbers / single punct marks."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0))


def num_pages_text(col: Column) -> Column:
    """Reference heuristic: 1 + len(full_text)//1000 (document.py:383-386)."""
    return (F.lit(1) + F.floor(F.length(col) / F.lit(1000))).cast("int")


def a_d_ratio(col: Column) -> Column:
    """alpha/(alpha+digit) ratio (reference document.py:150-163)."""
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    return (alpha / F.when(alpha + digit > 0, alpha + digit).otherwise(1)).cast(
        "double"
    )


# -------------------------------------------------------------- quality

QUALITY_STOPWORD_REGEX = r"\b(the|and|of|to|in|is|der|die|le|la|el|los)\b"


def quality_score(col: Column) -> Column:
    """Training-data quality score in [0,1]: mix of length signal,
    alpha ratio, mean word length sanity, stopword presence."""
    n_chars = F.length(col)
    n_w = num_words(col)
    mean_wl = n_chars / F.when(n_w > 0, n_w).otherwise(1)
    stop_hits = F.size(
        F.regexp_extract_all(F.lower(col), F.lit(QUALITY_STOPWORD_REGEX), 0)
    )
    len_sig = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    wl_sig = F.when((mean_wl >= 3) & (mean_wl <= 10), 1.0).otherwise(0.3)
    stop_sig = F.least(stop_hits / F.greatest(n_w, F.lit(1)) * 5.0, F.lit(1.0))
    return ((len_sig + wl_sig + stop_sig + a_d_ratio(col)) / 4.0).alias("quality")


def quality_score_sql(expr: str) -> str:
    """DuckDB twin of quality_score: identical arithmetic, identical
    operation order (doubles are IEEE-754 on both engines, so the same
    expression tree rounds to the same 4 decimals)."""
    nw = f"len(regexp_extract_all({expr}, '\\S+'))"
    sh = f"len(regexp_extract_all(lower({expr}), '{QUALITY_STOPWORD_REGEX}'))"
    alpha = f"length(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    digit = f"length(regexp_replace({expr}, '[^0-9]', '', 'g'))"
    mean_wl = f"(length({expr}) / (CASE WHEN {nw} > 0 THEN {nw} ELSE 1 END))"
    len_sig = f"least(length({expr}) / 500.0, 1.0)"
    wl_sig = f"(CASE WHEN {mean_wl} >= 3 AND {mean_wl} <= 10 THEN 1.0 ELSE 0.3 END)"
    stop_sig = f"least(({sh} / greatest({nw}, 1)) * 5.0, 1.0)"
    adr = f"({alpha} / (CASE WHEN {alpha} + {digit} > 0 THEN {alpha} + {digit} ELSE 1 END))"
    return f"round(({len_sig} + {wl_sig} + {stop_sig} + {adr}) / 4.0, 4)"


# -------------------------------------------------------------- lang id


def _lang_scores(col: Column) -> Column:
    """Array of (hits, lang) structs: stopword hit counts for the
    latin-script profiles, character counts for the script-scored
    classes."""
    lowered = F.lower(col)
    scores = []
    for lang, words in LANGID_STOPWORDS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        scores.append(
            F.struct(
                F.size(F.regexp_extract_all(lowered, F.lit(pat), 0)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    for lang, cls in LANGID_CHAR_CLASSES.items():
        scores.append(
            F.struct(
                F.size(F.regexp_extract_all(col, F.lit(cls), 0)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    return F.array(*scores)


def lang_id(col: Column) -> Column:
    """Stopword-profile language ID with 'unknown' default — same
    contract as the reference's langdetect wrapper with
    .default('unknown') (extract_classes.py:19-26).  zh has no stopword
    list; its score is the CJK-ideograph character count (langdetect
    covers zh in the reference; the corpus includes zh docs)."""
    best = F.array_max(_lang_scores(col))
    return F.when(best["hits"] > 0, best["lang"]).otherwise("unknown")


def lang_id_confidence(col: Column) -> Column:
    """Confidence for lang_id (r4 verdict item 7: downstream
    quota/filter ops need to treat low-confidence rows separately):
    best-language hit count over the whitespace token count, capped at
    1.0 (script-scored languages count CHARS, which can exceed the
    token count).  0.0 for 'unknown' rows — the signal that the doc
    matched no profile at all."""
    best = F.array_max(_lang_scores(col))
    nw = F.size(F.regexp_extract_all(col, F.lit(r"\S+"), 0))
    return F.round(
        F.least(best["hits"] / F.greatest(nw, F.lit(1)), F.lit(1.0)), 4)


def lang_id_confidence_sql(expr: str) -> str:
    """DuckDB twin of lang_id_confidence (greatest() over the same hit
    counts; identical cap and rounding)."""
    hits = {
        lang: f"len(regexp_extract_all(lower({expr}), '\\b({'|'.join(ws)})\\b'))"
        for lang, ws in LANGID_STOPWORDS.items()
    }
    for lang, cls in LANGID_CHAR_CLASSES.items():
        hits[lang] = f"len(regexp_extract_all({expr}, '{cls}'))"
    best = "greatest(" + ", ".join(hits.values()) + ")"
    nw = f"len(regexp_extract_all({expr}, '\\S+'))"
    return f"round(least({best} / greatest({nw}, 1), 1.0), 4)"


def lang_id_sql(expr: str) -> str:
    """DuckDB twin of lang_id: max (hits, lang) pair via greatest over
    structs is not portable — use a CASE over per-language hit counts
    with the SAME tie-break (lexicographically larger lang wins on equal
    hits, matching array_max struct comparison where hits tie)."""
    hits = {
        lang: f"len(regexp_extract_all(lower({expr}), '\\b({'|'.join(ws)})\\b'))"
        for lang, ws in LANGID_STOPWORDS.items()
    }
    for lang, cls in LANGID_CHAR_CLASSES.items():
        hits[lang] = f"len(regexp_extract_all({expr}, '{cls}'))"
    # array_max picks max by (hits, lang): build CASE ladder ordering langs
    # descending so the max-hits / max-lang pair wins
    langs = sorted(hits, reverse=True)
    cond = " ".join(
        f"WHEN {hits[lang]} > 0 AND "
        + " AND ".join(
            f"{hits[lang]} >= {hits[o]}" if o < lang else f"{hits[lang]} > {hits[o]}"
            for o in langs if o != lang
        )
        + f" THEN '{lang}'"
        for lang in langs
    )
    return f"CASE {cond} ELSE 'unknown' END"


def file_meta(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              path_col: str | None = None) -> DataFrame:
    """Fast-to-calculate per-document metadata (reference file_meta,
    document.py:400-415: filename, document_type, path, num_pages,
    num_words, a_d_ratio, language) as ONE whole-stage-codegen
    projection — every component is an existing pure-SQL operator."""
    from ..dispatch import doc_type_col

    c = F.col(text_col)
    path = F.col(path_col) if path_col else F.lit(None).cast("string")
    return df.select(
        id_col,
        path.alias("path"),
        F.element_at(F.split(path, "/"), -1).alias("filename"),
        doc_type_col(c).alias("doc_type"),
        num_pages_text(c).alias("n_pages"),
        num_words(c).alias("n_words"),
        F.round(a_d_ratio(c), 4).alias("ad_ratio"),
        lang_id(c).alias("language"),
    )


# --------------------------------------------------------- fingerprint


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (the reference fingerprints normalized table text the same way,
    extract_tables.py:686-689)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def fingerprint_sql(expr: str) -> str:
    return f"md5(regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g'))"


# ------------------------------------------------------ piece splitting


def text_pieces(df: DataFrame, text_col: str = "text", target: int = 384,
                maximum: int = 512) -> DataFrame:
    """Segment text into <=512-char pieces on word boundaries — the
    reference's TextPieceSplitter (extract_index.py:22-73) as a pure
    SQL expression: split into words, group into chunks by running
    length bucket, reassemble with aggregate().

    Deterministic: piece k holds words whose running char offset falls
    in [k*target, (k+1)*target).
    """
    words = df.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "w"),
    )
    win = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = words.withColumn(
        "cum", F.coalesce(F.sum(F.length("w") + 1).over(win), F.lit(0))
    )
    # collect (pos, w) structs, sort, then join — order-safe under shuffle
    pieces = (
        w.withColumn("piece", (F.col("cum") / target).cast("int"))
        .groupBy("doc_id", "piece")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda x: x["w"],
                ),
                " ",
            ).alias("piece_text")
        )
    )
    return pieces
