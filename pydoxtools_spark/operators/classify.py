"""Deterministic classifier stand-ins for the reference's HF-model tier.

The reference labels text boxes with a fine-tuned HF classifier
(TextBlockClassifier, extract_classes.py:78-103 — its main product is
the `addresses` filter, document.py:362-365) and pages with zero-shot
bart-mnli (PageClassifier, extract_classes.py:29-75).  Neither model
family is in this sandbox; these stand-ins keep the OPERATOR CONTRACT
(same inputs, same output columns, swap-in point for the real models as
batched pandas UDFs) with dependency-free, oracle-checkable logic:

  is_address       structural scoring: house-number pattern + street
                   keyword + zip/city line — >=2 of 3 features
  classify_profile generic keyword-profile argmax (the lang_id scoring
                   shape generalized to arbitrary label -> words maps)

Everything is pure Spark SQL with *_sql DuckDB twins.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _profile_alternation(words: list[str]) -> str:
    """Keyword list -> regex alternation; each keyword is re.escape-d so
    metacharacters match literally on BOTH engines (Java regex and RE2
    treat escaped punctuation identically)."""
    return r"\b(" + "|".join(re.escape(w) for w in words) + r")\b"


def _sql_str(s: str) -> str:
    """Single-quoted SQL string literal with '' doubling (DuckDB)."""
    return "'" + s.replace("'", "''") + "'"

ADDR_HOUSE_REGEX = r"\b\d{1,5}[a-dA-D]?\s+[A-Z][a-z]+"
ADDR_STREET_REGEX = (
    r"(?i)\b(street|st\.|avenue|ave\.?|road|rd\.?|boulevard|blvd\.?|lane|"
    r"drive|dr\.|platz|strasse|straße|weg|gasse)\b"
)
ADDR_ZIP_REGEX = r"\b\d{4,5}\b"


def _addr_score(col: Column):
    return (
        (F.regexp_count(col, F.lit(ADDR_HOUSE_REGEX)) > 0).cast("int")
        + (F.regexp_count(col, F.lit(ADDR_STREET_REGEX)) > 0).cast("int")
        + (F.regexp_count(col, F.lit(ADDR_ZIP_REGEX)) > 0).cast("int")
    )


def is_address(col: Column) -> Column:
    """Address-block detector: at least 2 of 3 structural features
    (house number, street keyword, zip-like digit group)."""
    return _addr_score(col) >= 2


def is_address_sql(expr: str) -> str:
    """DuckDB twin.  RE2 has no inline (?i); lower() the operand for the
    street-keyword feature instead."""
    street = ADDR_STREET_REGEX.replace("(?i)", "")
    house = (f"(CASE WHEN regexp_matches({expr}, "
             f"'{ADDR_HOUSE_REGEX}') THEN 1 ELSE 0 END)")
    st = (f"(CASE WHEN regexp_matches(lower({expr}), "
          f"'{street}') THEN 1 ELSE 0 END)")
    zc = (f"(CASE WHEN regexp_matches({expr}, "
          f"'{ADDR_ZIP_REGEX}') THEN 1 ELSE 0 END)")
    return f"(({house} + {st} + {zc}) >= 2)"


def classify_profile(col: Column, profiles: dict[str, list[str]],
                     default: str = "other") -> Column:
    """Keyword-profile argmax: label with the most keyword hits wins;
    ties break to the lexicographically larger label (array_max over
    (hits, label) structs — the lang_id convention)."""
    lowered = F.lower(col)
    scores = [
        F.struct(
            F.size(F.regexp_extract_all(
                lowered, F.lit(_profile_alternation(ws)), 0)).alias("hits"),
            F.lit(label).alias("label"),
        )
        for label, ws in profiles.items()
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["label"]).otherwise(default)


def classify_profile_sql(expr: str, profiles: dict[str, list[str]],
                         default: str = "other") -> str:
    """DuckDB twin with the SAME tie-break ladder as lang_id_sql.
    Keywords are re.escape-d and the pattern/label literals are
    ''-escaped, so metacharacters or quotes in caller-supplied profiles
    cannot produce a wrong pattern or malformed SQL."""
    hits = {
        label: ("len(regexp_extract_all(lower(" + expr + "), "
                + _sql_str(_profile_alternation(ws)) + "))")
        for label, ws in profiles.items()
    }
    labels = sorted(hits, reverse=True)
    cond = " ".join(
        f"WHEN {hits[lb]} > 0 AND "
        + " AND ".join(
            f"{hits[lb]} >= {hits[o]}" if o < lb else f"{hits[lb]} > {hits[o]}"
            for o in labels if o != lb
        )
        + f" THEN {_sql_str(lb)}"
        for lb in labels
    )
    return f"CASE {cond} ELSE {_sql_str(default)} END"
