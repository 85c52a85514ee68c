"""End-to-end extraction pipeline (Spark-first).

Logical plan (all relational steps are JVM-side / whole-stage-codegen;
Python appears only in two Arrow-batched kernels):

  documents_in (doc_id, spans)
    └─ posexplode(spans) ────────────────────────────┐ single pass
         ├─ kind='text' + plain      → split/posexplode (pure Spark SQL)
         ├─ kind='text' + md/wiki    → mapInPandas markdown kernel
         │                             (MARKUP_GUARD-routed dispatch)
         ├─ kind='html'              → mapInPandas html kernel
         ├─ kind='pdf_ref'/'pdf_bytes' → join pdf_elements →
         │     per-(doc,page-bucket) routed table kernel (per-page
         │     chars/grid decision) → relational assembly → join back
         ├─ kind='image_ref'         → projection
         └─ union → window(offset) → array_sort → collect per doc

Scale properties (SURVEY.md §4):
  * giant PDFs are split into page buckets BEFORE the kernel, so a
    5000-page doc parallelizes across executors; reading order is
    restored by a JVM-side array_sort on (span_idx, p_num, -y0, x0) —
    a per-doc sort, never a global sort;
  * the doc-level title threshold (median font size) is computed with
    F.median in a hash aggregate, not inside the kernel, keeping the
    kernel page-local;
  * html spans are hash-repartitioned for balance; AQE handles residual
    skew;
  * failures never kill a task: per-doc try/except inside kernels emits
    KIND_ERROR rows that surface as the `error` column + parse_failures
    metrics (reference semantics: .default()/forgiving_extracts,
    operators_base.py:186-194, dask_operators.py:48-57).
"""

from __future__ import annotations

import json as _json
import os as _os
import time
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .constants import (
    IN_KIND_DOCX_BYTES,
    IN_KIND_EPUB_BYTES,
    IN_KIND_HTML,
    IN_KIND_IMAGE_REF,
    IN_KIND_ODT_BYTES,
    IN_KIND_PDF_BYTES,
    IN_KIND_PDF_REF,
    IN_KIND_RTF_BYTES,
    IN_KIND_TEXT,
    KIND_ERROR,
    KIND_IMAGE,
    KIND_SENTINEL,
    KIND_TEXT,
    PARAGRAPH_SPLIT_REGEX,
)

PAGES_PER_BUCKET = 8

# mid-pipeline row shape: one output span + its reading-order sort keys
_OUT_SPAN = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("span_idx", IntegerType(), False),
        StructField("ord1", DoubleType(), False),
        StructField("ord2", DoubleType(), False),
        StructField("ord3", DoubleType(), False),
        StructField("kind", StringType(), False),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
    ]
)

def explode_input_spans(documents_in: DataFrame) -> DataFrame:
    return documents_in.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("in_kind"),
        F.col("span.text").alias("in_text"),
        F.col("span.media_ref").alias("in_ref"),
    )


def explode_input_refs(documents_in: DataFrame) -> DataFrame:
    """Ref-only twin of explode_input_spans: the span payload text is
    projected away BEFORE the explode via GetArrayStructFields
    (`spans.kind` / `spans.media_ref`) + arrays_zip, the shape Spark
    4.1's nested-schema pruning DOES push into the parquet scan —
    ReadSchema carries kind+media_ref only, never span.text.  (A
    `transform(spans, x -> struct(...))` lambda does NOT prune —
    verified on this Spark — and plain posexplode drags the full
    payload; this is the 100x mitigation named since r2: ref-only
    branches stop re-reading the text payload they never use.  With a
    flat Iceberg schema this projection would be free; with the nested
    interleaved layout the field-extraction IS the projection.)"""
    return documents_in.select(
        "doc_id",
        F.posexplode(
            F.arrays_zip(
                F.col("spans.kind").alias("kind"),
                F.col("spans.media_ref").alias("media_ref"),
            )
        ).alias("span_idx", "span"),
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("in_kind"),
        F.col("span.media_ref").alias("in_ref"),
    )


# ------------------------------------------------------------- branches


def _is_markup_text() -> F.Column:
    """Text spans whose content dispatch detects as markdown/mediawiki
    route to the markdown branch (reference: a .md payload gets the
    pandoc pipeline, document.py:66-113 + extract_pandoc.py:98-167);
    everything else keeps the pure-SQL paragraph split.  The cheap
    MARKUP_GUARD regex short-circuits in front of the 14-regex
    detection ladder (And codegen skips the right side when the left
    is false), so plain prose pays one payload scan per branch, not
    fourteen — measured ~20% of the text-path time at sf0.1."""
    from .dispatch import (
        MARKUP_GUARD,
        TYPE_MARKDOWN,
        TYPE_MEDIAWIKI,
        doc_type_col,
    )

    return F.col("in_text").rlike(MARKUP_GUARD) & doc_type_col(
        F.col("in_text")
    ).isin(TYPE_MARKDOWN, TYPE_MEDIAWIKI)


def _text_branch(spans: DataFrame) -> DataFrame:
    """Plain text -> paragraph spans, entirely in Spark SQL
    (reference extract_textstructure.py:72-82: blank-line split)."""
    paras = spans.filter(
        (F.col("in_kind") == IN_KIND_TEXT) & ~_is_markup_text()
    ).select(
        "doc_id",
        "span_idx",
        F.posexplode(
            F.split(F.trim(F.col("in_text")), PARAGRAPH_SPLIT_REGEX)
        ).alias("pos", "para"),
    )
    return paras.filter(F.length(F.trim("para")) > 0).select(
        "doc_id",
        "span_idx",
        F.col("pos").cast("double").alias("ord1"),
        F.lit(0.0).alias("ord2"),
        F.lit(0.0).alias("ord3"),
        F.lit(KIND_TEXT).alias("kind"),
        F.trim("para").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )


def _html_kernel(batches):
    """mapInPandas kernel: html payload -> output span rows."""
    from .functions.htmlparse import extract_html_spans

    cols = ["doc_id", "span_idx", "ord1", "ord2", "ord3", "kind", "text", "media_ref"]
    for pdf in batches:
        rows = []
        for doc_id, span_idx, raw in zip(
            pdf["doc_id"], pdf["span_idx"], pdf["in_text"]
        ):
            try:
                for i, (k, t, r) in enumerate(extract_html_spans(raw or "")):
                    rows.append((doc_id, int(span_idx), float(i), 0.0, 0.0, k, t, r))
            except Exception as e:  # failure containment, never task death
                rows.append(
                    (doc_id, int(span_idx), 0.0, 0.0, 0.0, KIND_ERROR,
                     f"html_parse_error: {type(e).__name__}: {e}", None)
                )
        yield pd.DataFrame(rows, columns=cols)


def _html_branch(spans: DataFrame, parallelism: int) -> DataFrame:
    html = spans.filter(F.col("in_kind") == IN_KIND_HTML).select(
        "doc_id", "span_idx", "in_text"
    )
    return html.mapInPandas(_html_kernel, _OUT_SPAN)


def _markdown_kernel(batches):
    """mapInPandas kernel: markdown/mediawiki payload -> output spans
    (functions/markdown.py; reference extract_pandoc.py:98-167 block
    mapping)."""
    from .dispatch import TYPE_MEDIAWIKI
    from .functions.markdown import extract_markdown_spans, extract_wiki_spans

    cols = ["doc_id", "span_idx", "ord1", "ord2", "ord3", "kind", "text", "media_ref"]
    for pdf in batches:
        rows = []
        for doc_id, span_idx, raw, dt in zip(
            pdf["doc_id"], pdf["span_idx"], pdf["in_text"], pdf["doc_type"]
        ):
            fn = extract_wiki_spans if dt == TYPE_MEDIAWIKI else extract_markdown_spans
            try:
                for i, (k, t, r) in enumerate(fn(raw or "")):
                    rows.append((doc_id, int(span_idx), float(i), 0.0, 0.0, k, t, r))
            except Exception as e:  # failure containment, never task death
                rows.append(
                    (doc_id, int(span_idx), 0.0, 0.0, 0.0, KIND_ERROR,
                     f"markdown_parse_error: {type(e).__name__}: {e}", None)
                )
        yield pd.DataFrame(rows, columns=cols)


def _markdown_branch(spans: DataFrame) -> DataFrame:
    from .dispatch import doc_type_col

    md = spans.filter(
        (F.col("in_kind") == IN_KIND_TEXT) & _is_markup_text()
    ).select(
        "doc_id", "span_idx", "in_text",
        doc_type_col(F.col("in_text")).alias("doc_type"),
    )
    return md.mapInPandas(_markdown_kernel, _OUT_SPAN)


def _parse_pdf_blobs_kernel(batches):
    """mapInPandas kernel: (ref, content) -> PDF_ELEMENT rows via the
    strict -> lenient repair ladder (functions/pdfparse.py; reference
    semantics pdf_utils.py:81-148).  A blob failing BOTH rungs emits a
    type='ParseError' row — the layout branch converts it to an error
    span, never a task failure."""
    from .functions.pdfparse import PdfParseError, pdf_elements_from_bytes
    from .schemas import PDF_ELEMENT

    cols = [f.name for f in PDF_ELEMENT.fields]
    for pdf in batches:
        rows: list[dict] = []
        emit_chars = bool(pdf["emit_chars"].iloc[0]) if len(pdf) else False
        for ref, content in zip(pdf["ref"], pdf["content"]):
            try:
                rows.extend(pdf_elements_from_bytes(
                    bytes(content), doc_id=ref, emit_chars=emit_chars))
            except PdfParseError as e:
                rows.append(dict(
                    doc_id=ref, p_num=0, boxnum=0, linenum=0,
                    type="ParseError", x0=0.0, y0=0.0, x1=0.0, y1=0.0,
                    rawtext=f"pdf_parse_error: {e}", font_name=None,
                    font_size=None, font_color=None,
                    mean_char_orientation=None, linewidth=None,
                    media_ref=None,
                ))
        yield pd.DataFrame(rows, columns=cols)


def parse_pdf_blobs(pdf_blobs: DataFrame, emit_chars: bool = False) -> DataFrame:
    """pdf_blobs(ref string, content binary) -> pdf_elements rows.
    This is the expensive scan of the bytes path (SURVEY.md §2.1
    PDFFileLoader row): Arrow-batched, one python worker import of the
    parser per executor (scalar-iterator form).  emit_chars feeds the
    full-fidelity table path (extract(..., table_mode='chars'))."""
    from .schemas import PDF_ELEMENT

    return pdf_blobs.select(
        "ref", "content", F.lit(emit_chars).alias("emit_chars")
    ).mapInPandas(_parse_pdf_blobs_kernel, PDF_ELEMENT)


HTML_META = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("span_idx", IntegerType(), False),
        StructField("title", StringType(), True),
        StructField("short_title", StringType(), True),
        StructField("keywords", ArrayType(StringType()), False),
        StructField("description", StringType(), True),
        StructField("language", StringType(), True),
        StructField("canonical_url", StringType(), True),
    ]
)


def html_meta_table(documents_in: DataFrame) -> DataFrame:
    """Per-HTML-span metadata columns (the reference HtmlExtractor's
    non-span outputs, extract_html.py:244-259: title/short_title,
    keywords, meta description/language, canonical url) as a side
    table keyed by (doc_id, span_idx)."""

    def kernel(batches):
        from .functions.htmlparse import extract_html_meta

        cols = [f.name for f in HTML_META.fields]
        for pdf in batches:
            rows = []
            for doc_id, span_idx, raw in zip(
                pdf["doc_id"], pdf["span_idx"], pdf["in_text"]
            ):
                try:
                    m = extract_html_meta(raw or "")
                except Exception:
                    m = {}
                rows.append(
                    (doc_id, int(span_idx), m.get("title"),
                     m.get("short_title"), m.get("keywords") or [],
                     m.get("description"), m.get("language"),
                     m.get("canonical_url"))
                )
            yield pd.DataFrame(rows, columns=cols)

    html = explode_input_spans(documents_in).filter(
        F.col("in_kind") == IN_KIND_HTML
    ).select("doc_id", "span_idx", "in_text")
    return html.mapInPandas(kernel, HTML_META)


def _pdf_branch(spans: DataFrame, pdf_elements: DataFrame,
                table_mode: str = "grid") -> DataFrame:
    """PDF layout branch: relational implementation (pure Spark SQL for
    grouping/cells/ordering; numpy only for page-local graphics
    clustering) — see operators/pdf_relational.py.  Serves both
    pre-parsed pdf_ref spans and parsed-from-bytes pdf_bytes spans (the
    caller unions parsed elements into pdf_elements)."""
    from .operators.pdf_relational import pdf_layout_items

    refs = spans.filter(
        F.col("in_kind").isin(IN_KIND_PDF_REF, IN_KIND_PDF_BYTES)
    ).select("doc_id", "span_idx", "in_ref")
    items = pdf_layout_items(pdf_elements, pages_per_bucket=PAGES_PER_BUCKET,
                             table_mode=table_mode)

    return refs.join(items, refs.in_ref == items.ref).select(
        "doc_id",
        "span_idx",
        F.col("p_num").cast("double").alias("ord1"),
        (-F.col("y0")).alias("ord2"),
        F.col("x0").alias("ord3"),
        "kind",
        "text",
        items.media_ref.alias("media_ref"),
    )


def _docx_kernel(batches):
    """mapInPandas kernel for zip-container documents: bytes -> output
    spans.  Self-describing dispatch per blob (magic + part probes,
    NOT the declared in_kind — a mislabeled blob still parses, and a
    hopeless one errors): docx (functions/docx.py, ECMA-376), odt
    (functions/odf.py, OASIS ODF), epub (functions/odf.py, XHTML
    chapters through the html kernel in spine order) — the reference's
    pandoc coverage (extract_pandoc.py:98-167) rebuilt from the
    container specs.  Parse failure is a contained error span, never
    task death."""
    from .functions.docx import extract_docx_spans, is_docx
    from .functions.odf import (
        extract_epub_spans,
        extract_odt_spans,
        is_epub,
        is_odt,
    )
    from .functions.rtf import extract_rtf_spans, is_rtf

    cols = ["doc_id", "span_idx", "ord1", "ord2", "ord3", "kind", "text",
            "media_ref"]
    for pdf in batches:
        rows = []
        for doc_id, span_idx, content in zip(
            pdf["doc_id"], pdf["span_idx"], pdf["content"]
        ):
            try:
                blob = bytes(content) if content is not None else b""
                if is_rtf(blob):
                    extracted = extract_rtf_spans(blob)
                elif is_docx(blob):
                    extracted = extract_docx_spans(blob)
                elif is_epub(blob):
                    extracted = extract_epub_spans(blob)
                elif is_odt(blob):
                    extracted = extract_odt_spans(blob)
                else:
                    raise ValueError(
                        "unrecognized container (rtf/docx/odt/epub probes"
                        " all negative)")
                for i, (k, t, r) in enumerate(extracted):
                    rows.append((doc_id, int(span_idx), float(i), 0.0, 0.0,
                                 k, t, r))
            except Exception as e:  # failure containment, never task death
                rows.append(
                    (doc_id, int(span_idx), 0.0, 0.0, 0.0, KIND_ERROR,
                     f"docx_parse_error: {type(e).__name__}: {e}", None)
                )
        yield pd.DataFrame(rows, columns=cols)


_CONTAINER_IN_KINDS = (IN_KIND_DOCX_BYTES, IN_KIND_ODT_BYTES,
                       IN_KIND_EPUB_BYTES, IN_KIND_RTF_BYTES)


def _docx_branch(spans: DataFrame, doc_blobs: DataFrame) -> DataFrame:
    """Container-document branch: docx/odt/epub_bytes spans join their
    binary payloads from doc_blobs(ref, content) — same side-table
    shape as pdf_blobs — and run the container kernel (which probes
    the actual format per blob).  A span whose ref has no blob row
    yields no spans (the doc still appears with an empty array via the
    sentinel), mirroring the pdf_ref convention."""
    refs = spans.filter(F.col("in_kind").isin(*_CONTAINER_IN_KINDS)).select(
        "doc_id", "span_idx", "in_ref"
    )
    joined = refs.join(doc_blobs, refs.in_ref == doc_blobs.ref).select(
        "doc_id", "span_idx", "content"
    )
    return joined.mapInPandas(_docx_kernel, _OUT_SPAN)


def _ocr_branch(spans: DataFrame, media_blobs: DataFrame,
                ocr_model) -> DataFrame:
    """OCR branch (reference chain document.py:320-355: image -> OCR ->
    text through the SAME pipeline): image_ref spans whose blobs exist
    in media_blobs(ref, content) run through the batched OCR plug
    point; recognized text becomes a text span ORDERED AFTER the image
    span (ord1=1 vs the image branch's 0), OCR failure a contained
    error span.  The model sees one Arrow batch of decoded images at a
    time (operators/multimodal.ocr_extract)."""
    from .operators.multimodal import ocr_extract

    refs = spans.filter(F.col("in_kind") == IN_KIND_IMAGE_REF).select(
        "doc_id", "span_idx", "in_ref"
    )
    ocr = ocr_extract(
        media_blobs.select(F.col("ref").alias("media_ref"), "content"),
        ocr_model,
    )
    joined = refs.join(ocr, refs.in_ref == ocr.media_ref)
    return joined.select(
        "doc_id",
        "span_idx",
        F.lit(1.0).alias("ord1"),
        F.lit(0.0).alias("ord2"),
        F.lit(0.0).alias("ord3"),
        F.when(F.col("error").isNotNull(), F.lit(KIND_ERROR))
        .otherwise(F.lit(KIND_TEXT)).alias("kind"),
        F.when(F.col("error").isNotNull(),
               F.concat(F.lit("ocr_error: "), F.col("error")))
        .otherwise(F.col("text")).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    ).filter(F.col("text").isNotNull())


_KNOWN_IN_KINDS = (
    IN_KIND_TEXT, IN_KIND_HTML, IN_KIND_PDF_REF, IN_KIND_PDF_BYTES,
    IN_KIND_DOCX_BYTES, IN_KIND_ODT_BYTES, IN_KIND_EPUB_BYTES,
    IN_KIND_RTF_BYTES, IN_KIND_IMAGE_REF,
)


def _unknown_kind_branch(spans: DataFrame) -> DataFrame:
    """Input spans of a kind no branch handles become contained error
    rows (error column + parse_failures metric) — a silently dropped
    payload at 10^12-doc scale is invisible data loss; an error row is
    auditable."""
    return spans.filter(~F.col("in_kind").isin(*_KNOWN_IN_KINDS)).select(
        "doc_id",
        "span_idx",
        F.lit(0.0).alias("ord1"),
        F.lit(0.0).alias("ord2"),
        F.lit(0.0).alias("ord3"),
        F.lit(KIND_ERROR).alias("kind"),
        F.concat(F.lit("unsupported input kind: "), F.col("in_kind")).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )


def _sentinel_branch(documents_in: DataFrame) -> DataFrame:
    """One marker row per document so docs whose spans produce no
    output still appear (empty array) WITHOUT a final join: sentinels
    flow through the same doc_id-partitioned window/groupBy, then get
    filtered out of the span array.  Replaces an all-docs sort-merge
    join (one scan + one shuffle + two stages cheaper)."""
    return documents_in.select(
        "doc_id",
        F.lit(-1).alias("span_idx"),
        F.lit(0.0).alias("ord1"),
        F.lit(0.0).alias("ord2"),
        F.lit(0.0).alias("ord3"),
        F.lit(KIND_SENTINEL).alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )


def _image_branch(spans: DataFrame) -> DataFrame:
    return spans.filter(F.col("in_kind") == IN_KIND_IMAGE_REF).select(
        "doc_id",
        "span_idx",
        F.lit(0.0).alias("ord1"),
        F.lit(0.0).alias("ord2"),
        F.lit(0.0).alias("ord3"),
        F.lit(KIND_IMAGE).alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.col("in_ref").alias("media_ref"),
    )


# ------------------------------------------------------------- assembly


def extract(
    spark: SparkSession,
    documents_in: DataFrame,
    pdf_elements: DataFrame | None = None,
    parallelism: int = 32,
    page_numbers: list[int] | None = None,
    max_pages: int | None = None,
    table_mode: str = "grid",
    pdf_blobs: DataFrame | None = None,
    doc_blobs: DataFrame | None = None,
    media_blobs: DataFrame | None = None,
    ocr_model=None,
    persist_spans: bool = False,
) -> DataFrame:
    """documents_in (+ pdf_elements side table, + optional
    pdf_blobs(ref, content binary) for raw-PDF-bytes ingestion, +
    optional doc_blobs(ref, content binary) for docx_bytes spans) ->
    extracted (doc_id, spans array<struct<kind,text,media_ref,offset>>,
    error).

    page_numbers / max_pages restrict PDF extraction to selected pages —
    the reference's page-slicing semantics (document.py:978-979,
    1025-1029; pdf_utils.py:306-309) as a JVM-side partition-prunable
    filter on the elements scan.

    table_mode: "grid" (element tables, relational cell assignment) or
    "chars" (full-fidelity word-rebuild/sweep-line/spanning-cell path —
    requires type='Char' rows; see operators/pdf_relational.py)."""
    # Statically-absent PDF input -> the pdf branch is skipped outright
    # (r7).  With the old empty-DataFrame default the branch still built
    # the FULL pdf_layout_items machinery over zero rows — its persist()
    # calls wrap the empties in InMemoryRelations that
    # PropagateEmptyRelation cannot see through, so every no-PDF
    # extract() planned and ran ~60 empty operators, ~10 empty
    # exchanges and an empty python router-kernel stage (plan-audited
    # on q_docx_spans).  Output is identical: pdf_ref/pdf_bytes spans
    # join against the item table, so with no elements they contribute
    # zero rows either way (the sentinel still emits the doc).
    has_pdf = pdf_elements is not None or pdf_blobs is not None
    if pdf_elements is None:
        from .schemas import PDF_ELEMENT

        # one explicit empty partition: the default empty DataFrame
        # carries defaultParallelism (32) empty partitions that union
        # into the parse stage as pure task overhead (r7)
        pdf_elements = spark.createDataFrame(
            spark.sparkContext.parallelize([], 1), schema=PDF_ELEMENT)
    if pdf_blobs is not None:
        pdf_elements = pdf_elements.unionByName(
            parse_pdf_blobs(pdf_blobs, emit_chars=(table_mode == "chars")))
    if page_numbers is not None:
        pdf_elements = pdf_elements.filter(F.col("p_num").isin(page_numbers))
    if max_pages is not None:
        pdf_elements = pdf_elements.filter(F.col("p_num") < max_pages)

    # Explode + hash-repartition up front: spreads giant docs' spans
    # evenly across tasks (skew defusal — the corpus writer clusters
    # giants within files, so file-split partitioning straggles).
    # Known trade-off (measured, acceptable): branch kind-filters get
    # pushed below this exchange, so the branches keep separate scans
    # (ReuseExchange needs identical subtrees), and Spark 4.1's nested
    # schema pruning does not prune span.text through posexplode.  At
    # 100 TB the mitigation is an explicit schema-subset read for the
    # ref-only branches (Iceberg column projection), not a plan change.
    spans = explode_input_spans(documents_in).repartition(
        parallelism, "doc_id", "span_idx"
    )
    if persist_spans:
        # One-scan mode: materialize the exploded frame once and let
        # every branch read the cache instead of re-scanning the source
        # (each branch otherwise keeps its own scan — filters push
        # below the exchange, so ReuseExchange never fires).  Trade-off
        # at 100 TB: the cache is ~corpus-sized on executor disk; use
        # when the source is remote/expensive to re-read, skip when
        # local storage is the scarcer resource.
        from pyspark import StorageLevel

        spans = spans.persist(StorageLevel.MEMORY_AND_DISK)
    # Ref-only branches (pdf/image/docx/ocr) never touch span.text:
    # they read through the column-pruned ref explode (scan carries
    # kind+media_ref only — the r2-named 100x mitigation, now code;
    # A/B at the 96k corpus in BASELINE.md).  In persist_spans mode
    # the single cached copy is cheaper than any re-scan, so they
    # share it instead.
    ref_spans = spans if persist_spans else explode_input_refs(documents_in)
    out = (
        _text_branch(spans)
        .unionByName(_markdown_branch(spans))
        .unionByName(_html_branch(spans, parallelism))
        .unionByName(_image_branch(ref_spans))
        .unionByName(_unknown_kind_branch(ref_spans))
        .unionByName(_sentinel_branch(documents_in))
    )
    if has_pdf:
        out = out.unionByName(_pdf_branch(ref_spans, pdf_elements, table_mode))
    if doc_blobs is not None:
        out = out.unionByName(_docx_branch(ref_spans, doc_blobs))
    if media_blobs is not None and ocr_model is not None:
        out = out.unionByName(_ocr_branch(ref_spans, media_blobs, ocr_model))

    # running char offset over the doc's reading-ordered span stream;
    # error spans contribute 0 and are routed to the error column.
    # `tb` = xxhash64 over null-disambiguated (kind, text, media_ref)
    # makes the order TOTAL with one cheap numeric key: the window and
    # the array_sort below sort by the identical (span_idx, ord1-3, tb)
    # prefix, so offsets always agree with the emitted span order, even
    # for rows tying on all four layout keys.  xxhash64 SKIPS null
    # inputs, so the nullable columns are coalesced to distinct
    # per-column sentinels — otherwise (text='x', media_ref=NULL) and
    # (text=NULL, media_ref='x') would hash identically and the window
    # order between them would be nondeterministic while array_sort
    # breaks the tie on kind/text.  (Rows tying on tb too are identical
    # in every emitted field — any order yields the same output.)
    # Chosen over (a) full kind/text/media_ref tie-breaker columns —
    # string sort keys, measured +13% on the 8-core scale point — and
    # (b) HOF prefix-sums over the assembled array — O(n^2) per doc,
    # measured +15% on the 2-core point from ~2000-span giant docs.
    out = out.withColumn(
        "tb",
        F.xxhash64(
            "kind",
            F.coalesce(F.col("text"), F.lit("\x00t")),
            F.coalesce(F.col("media_ref"), F.lit("\x00m")),
        ),
    )
    order_cols = [F.col(c) for c in ("span_idx", "ord1", "ord2", "ord3", "tb")]
    w = (
        Window.partitionBy("doc_id")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    text_len = F.when(
        F.col("kind").isin(KIND_ERROR, KIND_SENTINEL), F.lit(0)
    ).otherwise(F.length(F.coalesce(F.col("text"), F.lit(""))))
    out = out.withColumn(
        "offset", F.coalesce(F.sum(text_len).over(w), F.lit(0)).cast("int")
    )

    assembled = out.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("span_idx", "ord1", "ord2", "ord3", "tb", "kind",
                         "text", "media_ref", "offset")
            )
        ).alias("ordered"),
        F.max(F.when(F.col("kind") == KIND_ERROR, F.col("text"))).alias("error"),
    )
    return assembled.select(
        "doc_id",
        F.expr(
            "transform(filter(ordered, x -> x.kind NOT IN ('error', '__sentinel')),"
            " x -> struct(x.kind as kind, x.text as text,"
            " x.media_ref as media_ref, x.offset as offset))"
        ).alias("spans"),
        "error",
    )


# --------------------------------------------------------------- metrics


def metrics_for(extracted: DataFrame, run_id: str | None = None,
                input_snapshot: str | None = None) -> DataFrame:
    """Per-partition lineage + metrics rows (north rule; FIXTURES.md §5).
    Pure JVM aggregation over the extracted frame."""
    run_id = run_id or uuid.uuid4().hex[:12]
    return (
        extracted.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("docs_processed"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "parse_failures"),
            F.sum(F.size("spans")).alias("span_count"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            "docs_processed",
            "parse_failures",
            "span_count",
            F.lit(0).cast("long").alias("elapsed_ms"),
            F.lit(input_snapshot).alias("input_snapshot"),
        )
    )


# ------------------------------------------------------------ resumable


def list_snapshots(out_dir: str) -> list[str]:
    """Committed run directories, from the `_snapshots/*.json` markers.
    Only manifested directories participate in the resume anti-join and
    in read_extracted — unmanifested (crashed-mid-write) run dirs are
    invisible, exactly like an uncommitted Iceberg snapshot."""
    import glob
    import json as _json

    paths = []
    for m in sorted(glob.glob(f"{out_dir}/_snapshots/*.json")):
        try:
            with open(m) as fh:
                paths.append(_json.load(fh)["path"])
        except (OSError, ValueError, KeyError):
            continue  # torn marker: treat as uncommitted
    return paths


def _commit_snapshot(out_dir: str, run_id: str, run_path: str,
                     docs: int) -> None:
    """Atomic-enough snapshot commit: the marker file is created (via
    tmp + rename) strictly AFTER the data write succeeded."""
    import json as _json
    import os as _os

    snap_dir = f"{out_dir}/_snapshots"
    _os.makedirs(snap_dir, exist_ok=True)
    tmp = f"{snap_dir}/.{run_id}.json.tmp"
    with open(tmp, "w") as fh:
        _json.dump({"run_id": run_id, "path": run_path, "docs": docs,
                    "committed_at": time.time()}, fh)
    _os.replace(tmp, f"{snap_dir}/{run_id}.json")


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """The committed view of the output table: union of manifested
    snapshot directories only."""
    paths = list_snapshots(out_dir)
    if not paths:
        from .schemas import EXTRACTED

        return spark.createDataFrame([], schema=EXTRACTED)
    return spark.read.parquet(*paths)


def run_resumable(
    spark: SparkSession,
    documents_in: DataFrame,
    pdf_elements: DataFrame | None,
    out_dir: str,
    run_id: str | None = None,
    parallelism: int = 32,
    max_pages: int | None = None,
    **extract_kwargs,
) -> dict:
    """Resumable batch run: anti-join already-committed doc_ids (the
    parquet/Iceberg output snapshot IS the checkpoint — SURVEY.md §2.10),
    extract the remainder, append output + metrics.

    Single extraction pass: run-level counters come from an Observation
    attached to the write action (no pre-count job, kernels run exactly
    once), the write lands in a hive-partitioned `run_id=<id>/` subdir,
    and per-partition lineage metrics re-read ONLY that subdir (columns
    partition_id/error/size(spans)) — never the full output table.  The
    partition_id captured at write time is persisted in the output as
    the lineage column.

    Snapshot commit protocol (the parquet stand-in for Iceberg
    snapshots, SURVEY.md §7.3 risk 6): a run directory COUNTS as
    committed only once its `_snapshots/<run_id>.json` marker exists —
    the marker is written strictly after the data write succeeds, so a
    run killed mid-write leaves an unmanifested directory that the next
    run's anti-join IGNORES (its docs are re-extracted rather than
    silently lost).  With Iceberg this would be `MERGE INTO` + the
    snapshot log.

    **extract_kwargs forward to extract(): pdf_blobs / doc_blobs
    (docx/odt/epub/rtf containers) / media_blobs + ocr_model /
    table_mode / persist_spans — resumability covers every branch, not
    just the text/html/pdf core.
    """
    from pyspark.sql import Observation

    run_id = run_id or uuid.uuid4().hex[:12]
    spans_path = f"{out_dir}/extracted"
    metrics_path = f"{out_dir}/metrics"
    run_path = f"{spans_path}/run_id={run_id}"

    manifest = f"{out_dir}/_snapshots/{run_id}.json"
    if _os.path.exists(manifest):
        # run_id already committed: re-running would anti-join to an
        # empty todo, see n_done=0 and (pre-guard) rmtree the committed
        # run dir out from under its manifest.  Short-circuit instead —
        # a committed run is immutable.
        with open(manifest) as fh:
            snap = _json.load(fh)
        return {"run_id": run_id, "docs_processed": 0,
                "parse_failures": 0, "span_count": 0, "elapsed_ms": 0,
                "output": spans_path, "already_committed": True,
                "committed_docs": int(snap.get("docs", 0))}

    todo = documents_in
    committed_paths = list_snapshots(out_dir)
    if committed_paths:
        committed = spark.read.parquet(*committed_paths).select("doc_id")
        todo = documents_in.join(committed, "doc_id", "left_anti")

    t0 = time.monotonic()
    obs = Observation(f"extract_{run_id}")
    extracted = (
        extract(spark, todo, pdf_elements, parallelism, max_pages=max_pages,
                **extract_kwargs)
        .withColumn("partition_id", F.spark_partition_id())
        .observe(
            obs,
            F.count(F.lit(1)).alias("docs_processed"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "parse_failures"),
            F.sum(F.size("spans")).alias("span_count"),
        )
    )
    extracted.write.mode("append").parquet(run_path)
    elapsed_ms = int((time.monotonic() - t0) * 1000)
    stats = obs.get
    n_done = int(stats["docs_processed"] or 0)
    if n_done:
        # commit strictly after a successful non-empty data write (an
        # empty run dir has no parquet footers and must stay invisible)
        _commit_snapshot(out_dir, run_id, run_path, n_done)
        m = (
            spark.read.parquet(run_path)
            .groupBy("partition_id")
            .agg(
                F.count("*").alias("docs_processed"),
                F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                    "parse_failures"),
                F.sum(F.size("spans")).alias("span_count"),
            )
            .select(
                F.lit(run_id).alias("run_id"),
                "partition_id",
                "docs_processed",
                "parse_failures",
                "span_count",
                F.lit(elapsed_ms).cast("long").alias("elapsed_ms"),
                F.lit(run_path).alias("input_snapshot"),
            )
        )
        m.write.mode("append").parquet(metrics_path)
    else:
        # no-op resume: the run dir is empty and uncommitted by
        # construction — remove it so repeated resumes don't litter
        # extracted/ with unmanifested dirs (direct parent-dir reads of
        # the output tree stay clean).  Never touch a manifested dir:
        # the manifest is the commit marker, and a committed run's data
        # must survive any number of replays.
        if not _os.path.exists(f"{out_dir}/_snapshots/{run_id}.json"):
            import shutil

            shutil.rmtree(run_path, ignore_errors=True)
    return {"run_id": run_id, "docs_processed": n_done,
            "parse_failures": int(stats["parse_failures"] or 0),
            "span_count": int(stats["span_count"] or 0),
            "elapsed_ms": elapsed_ms, "output": spans_path}


# ----------------------------------------------------------- ingestion


def container_media_blobs(doc_blobs: DataFrame) -> DataFrame:
    """Embedded media of zip-container documents (docx word/media, odt
    Pictures/, epub OEBPS/images) -> one row per media part: (ref,
    target, media_ref, media_type, content, error).  `target` matches
    the image spans' media_ref (the rels target), so `ref + target`
    joins a span to its bytes; `media_ref` = 'ref#target' is the
    globally unique key the MEDIA shape wants — the rows feed
    media_features / ocr_extract directly (r4 verdict item 6; the
    reference extracts these via pandoc, extract_pandoc.py:98-167).
    Scale shape: one Arrow pass over the blob column, no shuffle; a
    corrupt zip is a contained error row."""

    def kernel(batches):
        from .functions.docx import extract_container_media

        cols = ["ref", "target", "media_ref", "media_type", "content",
                "error"]
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["ref"], pdf["content"]):
                try:
                    media = extract_container_media(
                        bytes(content) if content is not None else b"")
                except Exception as e:
                    rows.append((ref, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
                    continue
                for target, payload in media:
                    rows.append((ref, target, f"{ref}#{target}",
                                 "image", payload, None))
            yield pd.DataFrame(rows, columns=cols)

    return doc_blobs.select("ref", "content").mapInPandas(
        kernel,
        "ref string, target string, media_ref string, "
        "media_type string, content binary, error string")


def pdf_media_blobs(pdf_blobs: DataFrame) -> DataFrame:
    """Image XObject streams of raw PDFs -> one row per image: (ref,
    target, media_ref, media_type, width, height, content, error) —
    the PDF mirror of container_media_blobs (r5 verdict item 3; the
    reference surfaces every pdfminer LTFigure as an Image element,
    pdf_utils.py:286-398).  `target` is 'xobj{num}', matching the
    Image spans' media_ref suffix, so `ref + target` joins a span to
    its bytes.  The decodable subset (Flate /DeviceRGB) is re-encoded
    as BMP and feeds media_features directly; plug-in codecs (DCT/JPX/
    JBIG2/CCITT) pass through undecoded with their media_type — the
    bytes must not vanish just because the codec is external.  Scale
    shape: one Arrow pass over the blob column, no shuffle; a damaged
    or undecryptable PDF is a contained error row."""

    def kernel(batches):
        from .functions.pdfparse import extract_pdf_images

        cols = ["ref", "target", "media_ref", "media_type",
                "width", "height", "content", "error"]
        for pdf in batches:
            rows = []
            for ref, content in zip(pdf["ref"], pdf["content"]):
                try:
                    media = extract_pdf_images(
                        bytes(content) if content is not None else b"")
                except Exception as e:
                    rows.append((ref, None, None, None, None, None,
                                 None, f"{type(e).__name__}: {e}"))
                    continue
                for target, mtype, w, h, payload in media:
                    rows.append((ref, target, f"{ref}#{target}", mtype,
                                 w, h, payload, None))
            yield pd.DataFrame(rows, columns=cols)

    return pdf_blobs.select("ref", "content").mapInPandas(
        kernel,
        "ref string, target string, media_ref string, "
        "media_type string, width int, height int, "
        "content binary, error string")


def ingest_blobs(spark: SparkSession, blobs: DataFrame,
                 ref_col: str = "ref",
                 content_col: str = "content",
                 persist: bool = True) -> dict:
    """Raw (ref, content) blobs -> routed extract() inputs — the
    reference's Document(source=...) experience (document.py:66-113:
    magic/type detection chooses the pipeline) over a distributed blob
    table:

      pdf            -> pdf_bytes span + pdf_blobs side row
      docx/odt/epub/rtf -> container span + doc_blobs side row
      anything else  -> decoded via the force_decode ladder; html
                        payloads route to the html branch, the rest to
                        the text branch (dispatch.doc_type_col)

    Returns {"documents_in", "pdf_blobs", "doc_blobs"} ready for
    extract(**).  Scale shape: magic-prefix dispatch (%PDF-, {\\rtf,
    PK zip) is a pure-JVM byte comparison on the scan — no shuffle, no
    Python; ONLY PK-prefixed blobs (the minority needing a central-
    directory read to tell docx/odt/epub/plain-zip apart) go through
    the Arrow probe kernel, and only their (ref, kind) pairs join
    back, so the corpus-sized binary column never re-shuffles.

    persist=True (default) caches the routed (ref, content, in_kind)
    frame (MEMORY_AND_DISK): the three returned outputs feed 4-5
    extract() branches, and WITHOUT the cache every branch re-scans
    and re-probes the raw source — 29.3 -> 22.3 s on the 3000-file
    mixed-directory bench (BASELINE.md).  At cluster scale
    prefer materializing the routed frame to parquet once and running
    extract() from that (the spark-submit job's two-step shape);
    persist=False opts out when the caller manages its own
    materialization."""
    from .dispatch import TYPE_HTML, doc_type_col

    b = blobs.select(F.col(ref_col).alias("ref"),
                     F.col(content_col).alias("content"))
    # media/binary magics the engine has no extractor for: routed to
    # the 'binary' in_kind so _unknown_kind_branch emits an AUDITABLE
    # error span — the force_decode ladder never fails (ISO-8859-1
    # fallback), so without this probe a JPEG becomes silent mojibake
    # text (r4 advisor finding).  The null-byte leg catches arbitrary
    # binary payloads: no text encoding this engine decodes emits NUL.
    _is_binaryish = (~F.is_valid_utf8(F.col("content").cast("string"))
                     | F.expr("contains(content, X'00')"))
    _media_magic = (
        F.expr("startswith(content, X'89504E47')")        # PNG
        | F.expr("startswith(content, X'FFD8FF')")        # JPEG
        | F.expr("startswith(content, X'47494638')")      # GIF8
        | F.expr("startswith(content, X'49492A00')")      # TIFF II
        | F.expr("startswith(content, X'4D4D002A')")      # TIFF MM
        | F.expr("startswith(content, X'1F8B')")          # gzip
        | F.expr("startswith(content, X'7F454C46')")      # ELF
        # BM / RIFF are printable-ASCII prefixes: a text file starting
        # with the words "BMW..." or "RIFF..." must NOT route to
        # binary — require binary corroboration (NUL byte / invalid
        # utf-8), which every real BMP/WAV header satisfies via its
        # little-endian size fields (r5 advisor finding)
        | ((F.expr("startswith(content, X'424D')")        # BMP
            | F.expr("startswith(content, X'52494646')"))  # RIFF (wav/avi)
           & _is_binaryish)
        | (~F.is_valid_utf8(F.col("content").cast("string"))
           & F.expr("contains(content, X'00')"))
    )
    jvm_kind = (
        F.when(F.expr("startswith(content, X'255044462D')"),  # %PDF-
               IN_KIND_PDF_BYTES)
        .when(F.expr("startswith(content, X'7B5C727466')"),   # {\rtf
               IN_KIND_RTF_BYTES)
        .when(F.expr("startswith(content, X'504B0304')"),     # PK zip
               F.lit("_zip"))
        .when(_media_magic, F.lit("binary"))
        .otherwise("_text")
    )
    b = b.withColumn("in_kind", jvm_kind)

    def probe_zip(batches):
        from .dispatch import blob_in_kind

        for pdf in batches:
            yield pd.DataFrame(
                {"ref": pdf["ref"],
                 "zip_kind": [
                     blob_in_kind(bytes(c) if c is not None else b"")
                     for c in pdf["content"]]})

    zips = b.filter(F.col("in_kind") == "_zip")
    zip_kinds = zips.mapInPandas(probe_zip, "ref string, zip_kind string")
    routed = b.filter(F.col("in_kind") != "_zip").unionByName(
        # only the zip SUBSET joins its probe results — the rest of the
        # corpus-sized binary column never enters a shuffle
        zips.join(zip_kinds, "ref").select(
            "ref", "content",
            # a PK zip that probes to no known container is a plain
            # zip archive — binary, not latin-1-decodable text
            F.col("zip_kind").alias("in_kind"),
        )
    )
    if persist:
        from pyspark import StorageLevel

        routed = routed.persist(StorageLevel.MEMORY_AND_DISK)

    # 'binary' is deliberately NOT in _KNOWN_IN_KINDS: those spans
    # fall through to _unknown_kind_branch's contained error row
    binary_kinds = (IN_KIND_PDF_BYTES, "binary") + _CONTAINER_IN_KINDS
    textual = routed.filter(~F.col("in_kind").isin(*binary_kinds))
    from .sources.loaders import decode_text_col

    text_payload = decode_text_col(F.col("content"))
    textual_docs = textual.select(
        F.col("ref").alias("doc_id"),
        F.array(F.struct(
            F.when(doc_type_col(text_payload) == TYPE_HTML,
                   IN_KIND_HTML).otherwise(IN_KIND_TEXT).alias("kind"),
            text_payload.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        )).alias("spans"),
    )
    binary_docs = routed.filter(F.col("in_kind").isin(*binary_kinds)).select(
        F.col("ref").alias("doc_id"),
        F.array(F.struct(
            F.col("in_kind").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.col("ref").alias("media_ref"),
            F.lit(0).alias("offset"),
        )).alias("spans"),
    )
    # "routed" is returned so long-lived sessions can release the
    # cache (routed.unpersist()) once the consuming extract() has
    # materialized — without a handle, repeated ingest_blobs calls
    # accumulate blob-sized cached frames (r5 advisor finding)
    return {
        "documents_in": textual_docs.unionByName(binary_docs),
        "pdf_blobs": routed.filter(
            F.col("in_kind") == IN_KIND_PDF_BYTES).select("ref", "content"),
        "doc_blobs": routed.filter(
            F.col("in_kind").isin(*_CONTAINER_IN_KINDS)).select(
                "ref", "content"),
        "routed": routed,
    }


def extract_files(spark: SparkSession, directory: str,
                  wildcard: str = "*", parallelism: int = 32,
                  **extract_kwargs) -> DataFrame:
    """One call from a directory of mixed files to extracted spans:
    binaryFile scan -> format probe -> routed extract().  The doc_id
    is the file path (stable, unique).  The user-facing equivalent of
    iterating Document(path) over a folder, distributed."""
    from .sources.loaders import load_directory

    blobs = load_directory(spark, directory, wildcard=wildcard).select(
        F.col("path").alias("ref"), "content")
    # a directory of small files scans as ~1-file partitions: coalesce
    # to the requested parallelism so downstream kernels get balanced,
    # fewer, fuller tasks (per-task overhead dominated the 3000-file
    # bench otherwise)
    blobs = blobs.repartition(parallelism)
    parts = ingest_blobs(spark, blobs)
    return extract(
        spark, parts["documents_in"], None, parallelism,
        pdf_blobs=parts["pdf_blobs"], doc_blobs=parts["doc_blobs"],
        **extract_kwargs)
