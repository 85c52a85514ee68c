"""Document-type dispatch — the reference's "query router" rebuilt as
pure Spark SQL column expressions (no UDF: stays in whole-stage codegen).

Re-expresses the detection ladder of reference document.py:1123-1237:
  - HTML vs XML: tag sniff regex            (document.py:92-104)
  - JSON validity probe                     (document.py:1214-1218)
  - mediawiki markers                       (document.py:107-113)
  - markdown heuristic: >=3 of the pattern
    families must match                     (document.py:66-89)
  - fallback: text/plain

The same predicates are exported as ANSI SQL (DuckDB-compatible) for
the correctness oracle, so router parity is machine-checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pattern families for the markdown heuristic (>=3 must match,
# reference document.py:66-89). Kept RE2/ANSI-safe: no backrefs.
MD_PATTERNS = [
    r"(?m)^#{1,6} ",          # atx headings
    r"(?m)^> ",               # blockquote
    r"(?m)^[-*+] ",           # unordered list
    r"(?m)^\d+\. ",           # ordered list
    r"\[[^\]]+\]\([^)]+\)",   # links
    r"(?m)^```",              # fenced code
    r"\*\*[^*\n]+\*\*",       # bold
    r"(?m)^([-=]){3,}\s*$",   # setext underline / hr
    r"`[^`\n]+`",             # inline code
    r"(?m)^\|.+\|\s*$",       # pipe tables
]

# Cheap single-regex SUPERSET of "any markdown family or mediawiki
# marker": a hot-path short-circuit guard in front of the full
# detection ladder (14 regex scans per payload).  guard == False
# implies doc_type_col() can never return markdown/mediawiki (every
# MD_PATTERNS family and every MEDIAWIKI_SNIFF arm implies one of
# these markers), so routing on `guard AND ladder` is exactly
# equivalent — plain prose pays ONE regex scan instead of fourteen.
MARKUP_GUARD = (
    r"(?m)^(#{1,6} |> |[-*+] |\d+\. |```|[-=]{3}|\||== )"
    r"|\[\[|\{\{|\*\*|`|\[[^\]]+\]\("
)

HTML_SNIFF = r"(?is)<\s*(!doctype\s+html|html|head|body|div|p|table)\b"
XML_SNIFF = r"(?s)^\s*<\?xml"
MEDIAWIKI_SNIFF = r"\{\{[^}]*\}\}|\[\[[^\]]*\]\]|(?m)^== .* ==\s*$"
# object-with-string-key or array start (the reference uses a real
# json.loads probe, document.py:1214-1218; this sniff rejects the
# mediawiki '{{' prefix a naive [{ probe would accept)
JSON_SNIFF = r'(?s)^\s*(\{\s*"|\[)'

TYPE_HTML = "text/html"
TYPE_XML = "application/xml"
TYPE_JSON = "application/json"
TYPE_MEDIAWIKI = "text/x-wiki"
TYPE_MARKDOWN = "text/markdown"
TYPE_PLAIN = "text/plain"


def _md_family_count(col: Column) -> Column:
    c = F.lit(0)
    for pat in MD_PATTERNS:
        c = c + F.when(col.rlike(pat), 1).otherwise(0)
    return c


def doc_type_col(content: Column) -> Column:
    """Column expression mapping raw text content -> mimetype string."""
    return (
        F.when(content.rlike(XML_SNIFF), TYPE_XML)
        .when(content.rlike(HTML_SNIFF), TYPE_HTML)
        .when(content.rlike(JSON_SNIFF), TYPE_JSON)
        .when(content.rlike(MEDIAWIKI_SNIFF), TYPE_MEDIAWIKI)
        .when(_md_family_count(content) >= 3, TYPE_MARKDOWN)
        .otherwise(TYPE_PLAIN)
    )


def doc_type_sql(expr: str) -> str:
    """Same router as ANSI SQL (DuckDB regexp_matches) over text `expr`."""
    md_count = " + ".join(
        f"(CASE WHEN regexp_matches({expr}, '{p}') THEN 1 ELSE 0 END)"
        for p in MD_PATTERNS
    )
    return f"""CASE
      WHEN regexp_matches({expr}, '{XML_SNIFF}') THEN '{TYPE_XML}'
      WHEN regexp_matches({expr}, '{HTML_SNIFF}') THEN '{TYPE_HTML}'
      WHEN regexp_matches({expr}, '{JSON_SNIFF}') THEN '{TYPE_JSON}'
      WHEN regexp_matches({expr}, '{MEDIAWIKI_SNIFF}') THEN '{TYPE_MEDIAWIKI}'
      WHEN ({md_count}) >= 3 THEN '{TYPE_MARKDOWN}'
      ELSE '{TYPE_PLAIN}'
    END"""


# ------------------------------------------------------ binary dispatch

TYPE_PDF = "application/pdf"
TYPE_DOCX = ("application/vnd.openxmlformats-officedocument"
             ".wordprocessingml.document")
TYPE_ODT = "application/vnd.oasis.opendocument.text"
TYPE_EPUB = "application/epub+zip"
TYPE_RTF = "application/rtf"
TYPE_BINARY = "application/octet-stream"


def blob_doc_type(content: bytes) -> str:
    """Binary-payload dispatch (reference document_type detection for
    file payloads, document.py:107-113): magic-number probe — %PDF
    header -> pdf; PK zip magic + [Content_Types].xml with a
    word/document.xml part -> docx; anything else octet-stream.  Used
    by ingestion to assign in_kind before extract()."""
    if content[:5] == b"%PDF-":
        return TYPE_PDF
    if content[:5] == b"{\\rtf":
        return TYPE_RTF
    if content[:4] == b"PK\x03\x04":
        from .functions.docx import is_docx
        from .functions.odf import is_epub, is_odt

        if is_docx(content):
            return TYPE_DOCX
        if is_epub(content):
            return TYPE_EPUB
        if is_odt(content):
            return TYPE_ODT
    return TYPE_BINARY


def blob_in_kind(content: bytes) -> str:
    """blob -> documents_in span kind for extract() routing."""
    from .constants import (
        IN_KIND_DOCX_BYTES,
        IN_KIND_EPUB_BYTES,
        IN_KIND_ODT_BYTES,
        IN_KIND_PDF_BYTES,
        IN_KIND_RTF_BYTES,
    )

    t = blob_doc_type(content)
    if t == TYPE_PDF:
        return IN_KIND_PDF_BYTES
    if t == TYPE_DOCX:
        return IN_KIND_DOCX_BYTES
    if t == TYPE_ODT:
        return IN_KIND_ODT_BYTES
    if t == TYPE_EPUB:
        return IN_KIND_EPUB_BYTES
    if t == TYPE_RTF:
        return IN_KIND_RTF_BYTES
    return "binary"
