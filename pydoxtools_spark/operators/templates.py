"""Page/document template generation: render the extracted span stream
to text with `{Kind_idx}` placeholders for excluded kinds — the
reference's PageTemplateGenerator semantics
(extract_textstructure.py:398-460) over the spans table, as pure SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import PARAGRAPH_JOIN


def span_template(
    extracted: DataFrame,
    exclude_kinds: tuple[str, ...] = ("table", "image", "media"),
) -> DataFrame:
    """(doc_id, spans) -> (doc_id, template): spans joined by blank
    lines in reading order; excluded kinds become `{Kind_i}`
    placeholders (i = span position, mirroring the reference's
    `{Table_18}`-style ids, tests/test_extractor.py:668-674)."""
    excluded = ", ".join(f"'{k}'" for k in exclude_kinds)
    rendered = F.expr(
        "transform(spans, (x, i) -> CASE WHEN x.kind IN ({exc}) THEN "
        "concat('{{', initcap(x.kind), '_', i, '}}') "
        "ELSE coalesce(x.text, '') END)".format(exc=excluded)
    )
    return extracted.select(
        "doc_id",
        F.array_join(rendered, PARAGRAPH_JOIN).alias("template"),
    )
