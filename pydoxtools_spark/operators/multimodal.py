"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step itself is STUBBED (no image/audio libs in this
container — deterministic fake features, clearly marked); everything
Spark-side is real and tested: schema, partition sizing for large
blobs, Arrow batch shape, mapInPandas signature.

Reference parity: the reference renders PDF pages to PIL images
(pdf_utils.py:151-161) and runs OCR on them (extract_ocr.py:21-52);
its images are per-document in-process objects.  Here media are rows
(media_ref, content binary, meta) so a 100 TB corpus of media shards
across executors.
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
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)

FEATURE_DIM = 16


def _decode_image_stub(content: bytes) -> tuple[int, int]:
    """STUB: real impl would decode with PIL/libvips.  Deterministic
    fake dimensions derived from the content hash so tests are stable.
    Raises on empty payload the way a real decoder raises on garbage."""
    if not content:
        raise NotImplementedError("empty media payload (decoder stub)")
    h = hashlib.md5(content).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _feature_stub(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB: real impl = vision/audio embedding model.  Deterministic
    hash-derived unit vector (stable fake)."""
    h = hashlib.sha256(content).digest()
    v = [((h[i % 32] / 255.0) * 2.0 - 1.0) for i in range(dim)]
    n = sum(x * x for x in v) ** 0.5 or 1.0
    return [x / n for x in v]


def media_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + featurize media blobs via Arrow-batched mapInPandas.

    Real Spark plumbing: binary column travels through Arrow; one
    output row per media row; failures contained per row (width/height
    null on decode error).  Repartition upstream if blob-size skew is
    observed (giant videos -> dedicated partitions, same pattern as
    giant PDFs)."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for ref, mtype, content in zip(
                pdf["media_ref"], pdf["media_type"], pdf["content"]
            ):
                content = bytes(content) if content is not None else b""
                row = {
                    "media_ref": ref,
                    "media_type": mtype,
                    "n_bytes": len(content),
                    "content_hash": hashlib.md5(content).hexdigest(),
                    "width": None,
                    "height": None,
                    "feature": None,
                }
                try:
                    if mtype == "image":
                        row["width"], row["height"] = _decode_image_stub(content)
                    row["feature"] = _feature_stub(content)
                except Exception:
                    pass  # failure containment: nulls, not task death
                rows.append(row)
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, MEDIA_FEATURES)


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
