"""EXIF parse/build/strip (functions/exif.py) + the image-metadata
scrubbing operator (multimodal.scrub_image_metadata): GPS decimal
round-trips, lossless segment surgery (clean == untagged original),
pixel-identical decode, containment."""
import numpy as np
import pytest

from pydoxtools_spark.functions.exif import (
    build_exif_app1,
    insert_app1,
    parse_exif,
    strip_jpeg_metadata,
)
from pydoxtools_spark.functions.jpeg import build_jpeg, parse_jpeg
from pydoxtools_spark.functions.media import MediaDecodeError


def _tagged(gps=(48.858844, 2.294351), pad_to=None):
    base = build_jpeg(np.full((6, 8, 3), 120, np.uint8))
    app1 = build_exif_app1(make="ACME", model="Cam-1",
                           datetime="2026:08:18 01:00:00",
                           gps=gps, pad_to=pad_to)
    return base, insert_app1(base, app1)


def test_parse_and_gps_quadrants():
    _, tagged = _tagged()
    ex = parse_exif(tagged)
    assert ex["make"] == "ACME" and ex["model"] == "Cam-1"
    assert ex["datetime"] == "2026:08:18 01:00:00"
    assert ex["orientation"] == 1
    assert abs(ex["gps"][0] - 48.858844) < 1e-4
    assert abs(ex["gps"][1] - 2.294351) < 1e-4
    # southern/western hemisphere signs survive
    _, sw = _tagged(gps=(-33.856784, -151.215297 + 360 - 360))
    g = parse_exif(sw)["gps"]
    assert g[0] < 0 and g[1] < 0
    # no EXIF -> {}
    assert parse_exif(build_jpeg(np.zeros((2, 2, 3), np.uint8))) == {}


def test_strip_is_lossless_segment_surgery():
    base, tagged = _tagged(pad_to=500)
    assert len(tagged) == len(base) + 500
    clean, removed = strip_jpeg_metadata(tagged)
    assert removed == 500
    assert clean == base          # byte-identical to the untagged file
    assert parse_exif(clean) == {}
    w, h, px = parse_jpeg(clean)
    assert np.array_equal(np.unique(px), [120])
    # idempotent + no-op on clean files
    again, r2 = strip_jpeg_metadata(clean)
    assert r2 == 0 and again == clean
    # COM segments (comments) are metadata too
    com = b"\xff\xfe" + (12).to_bytes(2, "big") + b"secret com"
    tagged2 = base[:2] + com + base[2:]
    clean2, r3 = strip_jpeg_metadata(tagged2)
    assert clean2 == base and r3 == len(com)
    with pytest.raises(MediaDecodeError):
        strip_jpeg_metadata(b"BMnot-a-jpeg")


def test_scrub_image_metadata_operator(spark):
    from pydoxtools_spark.operators.multimodal import scrub_image_metadata

    base, tagged = _tagged(pad_to=400)
    _, no_gps = _tagged(gps=None, pad_to=None)
    rows = [("j1", bytearray(tagged)),
            ("j2", bytearray(no_gps)),
            ("p1", bytearray(b"\x89PNG\r\n\x1a\nnot-jpeg")),
            ("x1", bytearray(b"\xff\xd8\x00broken"))]
    media = spark.createDataFrame(rows, "media_ref string, content binary")
    out = {r["media_ref"]: r for r in
           scrub_image_metadata(media).collect()}
    assert out["j1"]["had_gps"] and out["j1"]["had_exif"]
    assert out["j1"]["removed_bytes"] == 400
    assert bytes(out["j1"]["content"]) == base
    assert out["j2"]["had_exif"] and not out["j2"]["had_gps"]
    assert out["p1"]["removed_bytes"] == 0    # non-JPEG passthrough
    assert bytes(out["p1"]["content"]).startswith(b"\x89PNG")
    assert out["x1"]["error"] is not None     # contained


def test_scrub_survives_corrupt_exif_ifd(spark):
    """r6 advisor finding: a JPEG whose APP1 framing is intact but
    whose TIFF IFD is garbage must still be scrubbed (segment surgery
    does not need the IFD); the audit columns go unknown instead of
    the whole blob failing closed."""
    import numpy as np

    from pydoxtools_spark.functions.jpeg import build_jpeg
    from pydoxtools_spark.operators.multimodal import scrub_image_metadata

    base = build_jpeg(np.full((4, 6, 3), 90, np.uint8))
    # APP1 with valid Exif header but a truncated/corrupt TIFF body
    body = b"Exif\x00\x00II*\x00\x08\x00\x00\x00\xff\xff"
    app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
    blob = base[:2] + app1 + base[2:]
    media = spark.createDataFrame(
        [("j1", bytearray(blob))], "media_ref string, content binary")
    r = scrub_image_metadata(media).collect()[0]
    assert r["error"] is None
    assert r["content"] is not None and r["removed_bytes"] > 0
    assert r["had_exif"] is None and r["had_gps"] is None
