"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded and featurized by Arrow-batched kernels.

Reference parity: the reference renders PDF pages to PIL images
(pdf_utils.py:151-161) and runs tesseract OCR on them
(extract_ocr.py:21-52); its images are per-document in-process
objects.  Here media are rows (media_ref, media_type, content binary,
meta) so a 100 TB corpus of media shards across executors, and the
decode step is a LADDER:

  BMP (24-bit BI_RGB)  -> real decode (functions/media.py reader):
                          exact width/height + 16-bin luminance
                          histogram feature + integer mean level
  RIFF/WAVE PCM        -> real decode: sample_rate / duration_ms +
                          16-bin amplitude histogram + mean |sample|
  anything else        -> contained decode_error row (nulls, never
                          task death) — the plug point where
                          PIL / libvips / ffmpeg slot in as the same
                          batched kernel shape

OCR is a model plug point (ocr_extract): any batched
images -> texts callable drops in; tests drive it with a mock model
over the deterministic text-raster pair (functions/media.py), proving
the batch shape, schema, and error-containment contracts without the
model dependency (reference chain document.py:320-355).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("content_hash", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("mean_level", IntegerType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("decode_error", StringType(), True),
    ]
)

FEATURE_DIM = 16


def decode_media(media_type: str, content: bytes) -> dict:
    """One blob -> decoded feature fields.  Raises MediaDecodeError for
    codecs outside the implemented ladder (the real-decoder plug
    point)."""
    from ..functions.media import (
        MediaDecodeError,
        amplitude_hist16,
        luminance_hist16,
        parse_bmp,
        parse_wav,
    )

    if content[:2] == b"BM":
        w, h, px = parse_bmp(content)
        hist, mean = luminance_hist16(px)
        return {"width": w, "height": h, "feature": hist, "mean_level": mean}
    if content[:4] == b"RIFF":
        rate, samples = parse_wav(content)
        hist, mean = amplitude_hist16(samples)
        return {
            "sample_rate": rate,
            "duration_ms": int(len(samples) * 1000 // max(rate, 1)),
            "feature": hist,
            "mean_level": mean,
        }
    raise MediaDecodeError(
        f"unsupported codec for media_type={media_type} "
        "(plug a real decoder into decode_media)")


def media_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + featurize media blobs via Arrow-batched mapInPandas.

    Real Spark plumbing: binary travels through Arrow; one output row
    per media row; failures contained per row (decode_error column,
    nulls elsewhere).  Repartition upstream if blob-size skew is
    observed (giant videos -> dedicated partitions, same pattern as
    giant PDFs)."""

    def kernel(batches):
        cols = [f.name for f in MEDIA_FEATURES.fields]
        for pdf in batches:
            rows = []
            for ref, mtype, content in zip(
                pdf["media_ref"], pdf["media_type"], pdf["content"]
            ):
                content = bytes(content) if content is not None else b""
                row = dict.fromkeys(cols)
                row.update(
                    media_ref=ref, media_type=mtype, n_bytes=len(content),
                    content_hash=hashlib.md5(content).hexdigest(),
                )
                try:
                    row.update(decode_media(mtype, content))
                except Exception as e:  # containment: error column, not death
                    row["decode_error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(kernel, MEDIA_FEATURES)


OCR_TEXT = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("text", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def ocr_extract(media: DataFrame, model) -> DataFrame:
    """OCR plug point (reference OCRExtractor, extract_ocr.py:21-52).

    `model` is any BATCHED callable  list[np.ndarray (h,w,3) uint8]
    -> list[str]  — tesseract/HF vision models wrap to this shape.
    The kernel decodes each image blob and invokes the model once per
    Arrow batch (the batch-size contract a real model needs); decode or
    model failure is contained per row."""

    def kernel(batches):
        from ..functions.media import parse_bmp

        for pdf in batches:
            refs, imgs, errs = [], [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                refs.append(ref)
                try:
                    _w, _h, px = parse_bmp(
                        bytes(content) if content is not None else b"")
                    imgs.append(px)
                    errs.append(None)
                except Exception as e:
                    imgs.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            ok = [im for im in imgs if im is not None]
            try:
                out = list(model(ok))
                # modelplug contract: one output per input, or the whole
                # batch is an error — a short list must not silently
                # null-out trailing rows, nor extras be silently dropped
                if len(out) != len(ok):
                    raise ValueError(
                        f"model returned {len(out)} texts for {len(ok)} images")
                texts = iter(out)
            except Exception as e:  # whole-batch model failure -> rows
                texts = iter([])
                errs = [err or f"model_error: {type(e).__name__}: {e}"
                        for err in errs]
            rows = []
            for ref, im, err in zip(refs, imgs, errs):
                rows.append((
                    ref,
                    next(texts, None) if im is not None and err is None
                    else None,
                    err))
            yield pd.DataFrame(rows, columns=["media_ref", "text", "error"])

    return media.select("media_ref", "content").mapInPandas(kernel, OCR_TEXT)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling PLUMBING: expands (media_ref, n_frames meta)
    into one row per sampled frame index — pure SQL explode; the actual
    frame decode would plug into media_features.  Demonstrates the
    partitioning story: frames of one video spread across tasks."""
    n = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    return media.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


PDF_META = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("n_pages", IntegerType(), True),
        StructField("producer", StringType(), True),
        StructField("creator", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def pdf_meta_from_blobs(blobs: DataFrame, id_col: str = "doc_id",
                        content_col: str = "content") -> DataFrame:
    """Document metadata from raw PDF bytes (reference meta_infos,
    document.py:383-415 + pdfminer doc.info): page count from the
    /Pages /Count, producer/creator from the trailer /Info dict.
    Arrow-batched kernel, per-row error containment — a hopeless blob
    yields an error row, never a task death."""

    def kernel(batches):
        from ..functions.pdfparse import parse_pdf_info

        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    info = parse_pdf_info(
                        bytes(content) if content is not None else b"")
                    rows.append((did, info["n_pages"], info["producer"],
                                 info["creator"], None))
                except Exception as e:
                    rows.append((did, None, None, None,
                                 f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_pages", "producer", "creator",
                               "error"])

    return blobs.select(
        F.col(id_col).cast("string").alias(id_col), content_col
    ).mapInPandas(kernel, PDF_META)


PDF_RENDER = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("p_num", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_dark", IntegerType(), True),
        StructField("content", BinaryType(), True),
        StructField("error", StringType(), True),
    ]
)


def render_pdf_pages(blobs: DataFrame, scale: float = 0.25,
                     id_col: str = "doc_id",
                     content_col: str = "content",
                     max_pages: int | None = None) -> DataFrame:
    """PDF page rasterization (reference PDFImageRenderer,
    pdf_utils.py:151-161 renders pages to PIL images for OCR/preview):
    a deterministic BOX-LEVEL rasterizer — each parsed element's bbox
    darkens its pixel rectangle (text gray 64, graphics 128) on a
    white page scaled by `scale` — producing a REAL BMP per page that
    flows into media_features / ocr_extract like any other image blob.
    Glyph-level rendering is the font-stack plug point; the box raster
    keeps the pdf -> image -> features chain executable and
    pixel-exactly checkable.

    Pixel convention: x0/y0 floor, x1/y1 ceil after scaling, clipped to
    the page — integer-exact for fixture geometry, so oracles can
    compute n_dark analytically.  One output row per (doc, page);
    parse failure is an error row, never task death.

    max_pages caps rasters PER DOCUMENT (mirrors extract()'s
    max_pages): a single 10k-page PDF would otherwise pin one task
    with gigabytes of raster output — giant-doc skew at 100x."""

    def kernel(batches):
        import numpy as np

        from ..functions.media import build_bmp
        from ..functions.pdfparse import (
            PAGE_H,
            PAGE_W,
            pdf_elements_from_bytes,
        )

        w_px = int(np.ceil(PAGE_W * scale))
        h_px = int(np.ceil(PAGE_H * scale))
        cols = [f.name for f in PDF_RENDER.fields]
        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    els = pdf_elements_from_bytes(
                        bytes(content) if content is not None else b"",
                        doc_id=str(did))
                except Exception as e:
                    rows.append((did, None, None, None, None, None,
                                 f"{type(e).__name__}: {e}"))
                    continue
                pages: dict[int, list] = {}
                for r in els:
                    if r["type"] in ("Text", "Graphic"):
                        pages.setdefault(r["p_num"], []).append(r)
                page_nums = sorted(pages)
                if max_pages is not None:
                    page_nums = page_nums[:max_pages]
                for p_num in page_nums:
                    px = np.full((h_px, w_px, 3), 255, dtype=np.uint8)
                    for r in pages[p_num]:
                        x0 = max(0, int(np.floor(r["x0"] * scale)))
                        y0 = max(0, int(np.floor(r["y0"] * scale)))
                        x1 = min(w_px, int(np.ceil(r["x1"] * scale)))
                        y1 = min(h_px, int(np.ceil(r["y1"] * scale)))
                        # degenerate boxes (horizontal/vertical rules)
                        # still paint a 1px hairline
                        if x1 <= x0:
                            x1 = min(w_px, x0 + 1)
                        if y1 <= y0:
                            y1 = min(h_px, y0 + 1)
                        level = 64 if r["type"] == "Text" else 128
                        # page y is bottom-up; raster row 0 is top
                        px[h_px - y1:h_px - y0, x0:x1] = level
                    n_dark = int((px[:, :, 0] != 255).sum())
                    rows.append((did, int(p_num), w_px, h_px, n_dark,
                                 build_bmp(px), None))
            yield pd.DataFrame(rows, columns=cols)

    return blobs.select(
        F.col(id_col).cast("string").alias(id_col), content_col
    ).mapInPandas(kernel, PDF_RENDER)
