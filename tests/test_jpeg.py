"""Baseline JPEG codec (functions/jpeg.py) — writer/reader round
trips, the uniform-gray exactness contract the driver oracle depends
on, containment for non-baseline files, and the /DCTDecode -> decode
-> media_features chain (reference hands DCT payloads to PIL,
pdf_utils.py:286-398; this sandbox decodes them from scratch)."""

from __future__ import annotations

import numpy as np
import pytest

from pydoxtools_spark.functions.jpeg import build_jpeg, parse_jpeg
from pydoxtools_spark.functions.media import MediaDecodeError


def test_uniform_even_gray_round_trips_exactly():
    """DC = 8*(v-128), luma quant step 16 at quality 50: any EVEN
    uniform gray survives quantization exactly — the analytic-oracle
    contract for a lossy codec."""
    for v in (0, 2, 16, 100, 128, 144, 240, 254):
        for shape in ((8, 8), (16, 24), (13, 17)):  # incl. odd dims
            img = np.full(shape, v, np.uint8)
            w, h, px = parse_jpeg(build_jpeg(img))
            assert (w, h) == (shape[1], shape[0])
            assert px.shape == (shape[0], shape[1], 3)
            assert np.array_equal(np.unique(px), [v]), (v, shape)


def test_uniform_even_gray_rgb_exact():
    """3-component path: r=g=b makes the BT.601 chroma planes exactly
    zero (cb/cr coefficient rows sum to 0), so the even-gray exactness
    holds for color files too."""
    for v in (64, 90, 200):
        img = np.full((10, 14, 3), v, np.uint8)
        w, h, px = parse_jpeg(build_jpeg(img))
        assert np.array_equal(np.unique(px), [v]), v


def test_gradient_psnr_and_determinism():
    yy, xx = np.mgrid[0:24, 0:40]
    img = np.stack([np.minimum(yy * 9, 255), np.minimum(xx * 5, 255),
                    np.full_like(yy, 60)], -1).astype(np.uint8)
    data = build_jpeg(img, quality=90)
    assert data == build_jpeg(img, quality=90)  # bit-deterministic
    w, h, px = parse_jpeg(data)
    mse = np.mean((px.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 35.0


def test_quality_knob_monotone_size():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    sizes = [len(build_jpeg(img, quality=q)) for q in (10, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_containment_non_baseline_and_garbage():
    img = np.full((8, 8), 128, np.uint8)
    data = bytearray(build_jpeg(img))
    # flip SOF0 -> SOF2 (progressive): plug-point error, not a crash
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(MediaDecodeError, match="progressive|baseline"):
        parse_jpeg(bytes(data))
    with pytest.raises(MediaDecodeError):
        parse_jpeg(b"\x89PNG\r\n")
    with pytest.raises(MediaDecodeError):
        parse_jpeg(build_jpeg(img)[:40])  # truncated before SOS


def test_pdf_dct_xobject_decodes_end_to_end():
    """build_tiny_pdf(kind='dct') embeds a REAL baseline JPEG; the
    extract_pdf_images passthrough ('image/jpeg') now decodes — a
    uniform even gray comes back pixel-exact through the PDF."""
    from pydoxtools_spark.functions.pdfparse import (
        build_tiny_pdf, extract_pdf_images)

    pages = [{"texts": [(72.0, 700.0, 18.0, "Doc X")],
              "images": [(100.0, 500.0, 80.0, 60.0, "dct", 16, 12,
                          (90, 90, 90))]}]
    for kw in ({}, {"compress": True}, {"encrypt": True}):
        media = extract_pdf_images(build_tiny_pdf(pages, **kw))
        assert len(media) == 1
        target, mt, w, h, content = media[0]
        assert mt == "image/jpeg" and (w, h) == (16, 12)
        jw, jh, px = parse_jpeg(content)
        assert (jw, jh) == (16, 12)
        assert np.array_equal(np.unique(px), [90]), kw


def test_jbig2_stays_undecoded_passthrough():
    from pydoxtools_spark.functions.pdfparse import (
        build_tiny_pdf, extract_pdf_images)

    pages = [{"images": [(10.0, 10.0, 50.0, 40.0, "jbig2", 24, 16)]}]
    media = extract_pdf_images(build_tiny_pdf(pages))
    assert len(media) == 1
    target, mt, w, h, content = media[0]
    assert mt == "image/jbig2" and content.startswith(b"JBIG2PAYLOAD")


def test_media_features_decodes_jpeg_blobs(spark):
    """image/jpeg blobs flow through the media_features kernel: even
    uniform gray yields exact mean_level; a truncated JPEG is a
    contained decode_error row."""
    from pydoxtools_spark.operators.multimodal import media_features

    good = build_jpeg(np.full((6, 9, 3), 120, np.uint8))
    rows = [("m1", "image", bytearray(good), None),
            ("m2", "image", bytearray(good[:30]), None)]
    media = spark.createDataFrame(
        rows, "media_ref string, media_type string, content binary, "
              "meta map<string,string>")
    out = {r["media_ref"]: r for r in media_features(media).collect()}
    ok = out["m1"]
    assert (ok["width"], ok["height"]) == (9, 6)
    assert ok["mean_level"] == 120 and ok["decode_error"] is None
    assert out["m2"]["decode_error"] is not None


def test_truncated_entropy_stream_raises():
    """r6 advisor finding: the bit reader's zero padding decodes as
    valid Annex-K codes, so a truncated stream used to fabricate
    zero-diff blocks silently; it must raise instead."""
    import numpy as np
    import pytest

    from pydoxtools_spark.functions.jpeg import (
        MediaDecodeError,
        build_jpeg,
        parse_jpeg,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = build_jpeg(px)
    # cut well inside the entropy segment, keep the EOI so the framing
    # scanner still terminates normally
    cut = data[: len(data) - len(data) // 3] + b"\xff\xd9"
    with pytest.raises(MediaDecodeError):
        parse_jpeg(cut)
    # sanity: the untouched stream still decodes
    parse_jpeg(data)
