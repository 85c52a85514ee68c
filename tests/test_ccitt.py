"""CCITT Group 4 (ITU-T T.6) codec: table structure, round-trips,
and the PDF bit-semantics layer (functions/ccitt.py).

Reference behavior: pydoxtools surfaces scanned-PDF images through
pdfminer, which ships its own CCITT decoder (pdf_utils.py:286-398);
this engine decodes /CCITTFaxDecode (K<0) itself.  Round-trips are
exact by construction (shared tables), so the structural test that
actually guards against table transcription errors is PREFIX-FREENESS
per color context — a corrupted code word almost always collides."""
import numpy as np
import pytest

from pydoxtools_spark.functions.ccitt import (
    _BLACK_MAKEUP,
    _BLACK_TERM,
    _EXT_MAKEUP,
    _MODE_BITS,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    CcittError,
    build_ccitt_g4,
    g4_to_gray,
    parse_ccitt_g4,
)


def _assert_prefix_free(codes: list[str], label: str):
    s = sorted(codes)
    for a, b in zip(s, s[1:]):
        assert not b.startswith(a), f"{label}: {a!r} prefixes {b!r}"
    assert len(set(codes)) == len(codes), f"{label}: duplicate code"


def test_tables_prefix_free_and_spot_values():
    white = list(_WHITE_TERM.values()) + list(_WHITE_MAKEUP.values()) \
        + list(_EXT_MAKEUP.values())
    black = list(_BLACK_TERM.values()) + list(_BLACK_MAKEUP.values()) \
        + list(_EXT_MAKEUP.values())
    _assert_prefix_free(white, "white")
    _assert_prefix_free(black, "black")
    _assert_prefix_free(list(_MODE_BITS.values()), "modes")
    # spec spot checks (T.4 tables 2-4, T.6 vertical codes)
    assert _WHITE_TERM[0] == "00110101" and _BLACK_TERM[0] == "0000110111"
    assert _WHITE_TERM[63] == "00110100" and _BLACK_TERM[2] == "11"
    assert _WHITE_MAKEUP[1728] == "010011011"
    assert _EXT_MAKEUP[2560] == "000000011111"
    assert _MODE_BITS["EOL"] == "000000000001"
    # run coverage: every multiple of 64 up to 2560 has a make-up
    assert sorted({**_WHITE_MAKEUP, **_EXT_MAKEUP}) == \
        [64 * i for i in range(1, 41)]
    assert sorted({**_BLACK_MAKEUP, **_EXT_MAKEUP}) == \
        [64 * i for i in range(1, 41)]
    assert sorted(_WHITE_TERM) == sorted(_BLACK_TERM) == list(range(64))


def _roundtrip(ink: np.ndarray):
    data = build_ccitt_g4(ink)
    out = parse_ccitt_g4(data, columns=ink.shape[1], rows=ink.shape[0])
    np.testing.assert_array_equal(out, ink.astype(bool))
    # EndOfBlock path: rows unknown -> EOFB terminates
    out2 = parse_ccitt_g4(data, columns=ink.shape[1])
    np.testing.assert_array_equal(out2, ink.astype(bool))
    return data


def test_roundtrip_degenerate_shapes():
    _roundtrip(np.zeros((1, 1), dtype=bool))
    _roundtrip(np.ones((1, 1), dtype=bool))
    _roundtrip(np.zeros((6, 8), dtype=bool))      # all white: V0 rows
    _roundtrip(np.ones((6, 8), dtype=bool))       # all black
    _roundtrip(np.eye(7, dtype=bool))             # diagonal: vertical modes


def test_roundtrip_checkerboard_and_stripes():
    y, x = np.mgrid[0:9, 0:13]
    _roundtrip((x + y) % 2 == 0)                  # 1-px checkerboard
    _roundtrip((x % 4) < 2)                       # vertical stripes
    _roundtrip((y % 3) == 1)                      # horizontal bands
    # rectangle drifting right by 2px/row: exercises pass + VR/VL
    _roundtrip((x >= y * 2) & (x < y * 2 + 5))


def test_roundtrip_makeup_chains():
    # single row wider than the 2560 make-up ceiling: chained make-ups
    # + zero-run terminators, both colors
    row = np.zeros((1, 6000), dtype=bool)
    row[0, 100:5900] = True                       # black run 5800
    _roundtrip(row)
    _roundtrip(np.zeros((2, 2700), dtype=bool))   # white run 2700
    _roundtrip(np.ones((2, 2624), dtype=bool))    # exactly 2560+64
    row64 = np.zeros((1, 130), dtype=bool)
    row64[0, 0:64] = True                         # make-up 64 + term 0
    _roundtrip(row64)


def test_roundtrip_random_seeded():
    for seed, (h, w) in [(1, (5, 3)), (2, (16, 16)), (3, (9, 40)),
                         (4, (3, 1729)), (5, (31, 7))]:
        rng = np.random.default_rng(seed)
        _roundtrip(rng.random((h, w)) < 0.4)
        _roundtrip(rng.random((h, w)) < 0.95)     # dense ink


def test_truncated_and_garbage_contained():
    data = build_ccitt_g4(np.eye(12, dtype=bool))
    with pytest.raises(CcittError):
        parse_ccitt_g4(data[: len(data) // 2], columns=12, rows=12)
    with pytest.raises(CcittError):
        parse_ccitt_g4(b"\x00\x00\x00\x00", columns=8, rows=4)
    with pytest.raises(CcittError):
        build_ccitt_g4(np.zeros((0, 4), dtype=bool))
    with pytest.raises(CcittError):
        parse_ccitt_g4(data, columns=0, rows=1)


def test_g4_to_gray_bit_semantics():
    ink = np.array([[True, False]])
    # default: BlackIs1 false, Decode [0 1] -> ink renders black
    np.testing.assert_array_equal(g4_to_gray(ink), [[0, 255]])
    # BlackIs1 true without /Decode: ink bit 1 -> gray 1.0 -> WHITE
    # (the spec chain; producers pair it with /Decode [1 0])
    np.testing.assert_array_equal(
        g4_to_gray(ink, blackis1=True), [[255, 0]])
    np.testing.assert_array_equal(
        g4_to_gray(ink, blackis1=True, decode=(1.0, 0.0)), [[0, 255]])
    np.testing.assert_array_equal(
        g4_to_gray(ink, decode=(1.0, 0.0)), [[255, 0]])


def test_known_all_white_bits():
    # 8x2 all-white: each row is one V0 bit ('1'); EOFB = 24 bits of
    # EOL+EOL.  Stream: 11 000000000001 000000000001 + 6 pad zeros
    # -> bytes 11000000 00000100 00000000 01000000
    assert build_ccitt_g4(np.zeros((2, 8), dtype=bool)) == \
        bytes([0b11000000, 0b00000100, 0b00000000, 0b01000000])


def test_pdf_g4_xobject_decodes_end_to_end():
    """build_tiny_pdf(kind='g4') embeds a REAL CCITT G4 payload;
    extract_pdf_images decodes it (K<0 subset) and re-encodes BMP —
    the stripe pattern comes back pixel-exact, ink black."""
    from pydoxtools_spark.functions.media import parse_bmp
    from pydoxtools_spark.functions.pdfparse import (
        build_tiny_pdf, extract_pdf_images)

    pages = [{"texts": [(72.0, 700.0, 18.0, "Doc X")],
              "images": [(100.0, 500.0, 80.0, 60.0, "g4", 16, 8,
                          (3, 0, 0))]}]  # phase 3 stripes
    exp_col = (np.arange(16) + 3) % 4 < 2
    exp = np.where(np.broadcast_to(exp_col, (8, 16))[:, :, None],
                   0, 255).astype(np.uint8).repeat(3, axis=2)
    for kw in ({}, {"compress": True}, {"encrypt": True}):
        media = extract_pdf_images(build_tiny_pdf(pages, **kw))
        assert len(media) == 1
        target, mt, w, h, content = media[0]
        assert mt == "image/bmp" and (w, h) == (16, 8), kw
        bw, bh, px = parse_bmp(content)
        assert (bw, bh) == (16, 8)
        np.testing.assert_array_equal(px, exp)


def test_try_ccitt_parms_and_passthrough():
    """_try_ccitt honors /BlackIs1 + /Decode and declines the
    out-of-subset shapes (K>=0, EncodedByteAlign, corrupt stream)."""
    from pydoxtools_spark.functions.media import parse_bmp
    from pydoxtools_spark.functions.pdfparse import _try_ccitt

    ink = np.zeros((4, 8), dtype=bool)
    ink[:, 2:5] = True
    data = build_ccitt_g4(ink)
    parms = b"/DecodeParms << /K -1 /Columns 8 /Rows 4 >>"
    bmp = _try_ccitt(b"<< " + parms + b" >>", data, 4)
    _, _, px = parse_bmp(bmp)
    np.testing.assert_array_equal(px[0, :, 0],
                                  np.where(ink[0], 0, 255))
    # BlackIs1 true without /Decode: ink renders WHITE (spec chain)
    bmp = _try_ccitt(
        b"<< /DecodeParms << /K -1 /Columns 8 /BlackIs1 true >> >>",
        data, 4)
    _, _, px = parse_bmp(bmp)
    np.testing.assert_array_equal(px[0, :, 0],
                                  np.where(ink[0], 255, 0))
    # ... and /Decode [1 0] flips it back to ink-black
    bmp = _try_ccitt(
        b"<< /Decode [1 0] /DecodeParms << /K -1 /Columns 8 "
        b"/BlackIs1 true >> >>", data, 4)
    _, _, px = parse_bmp(bmp)
    np.testing.assert_array_equal(px[0, :, 0],
                                  np.where(ink[0], 0, 255))
    # out-of-subset: 1-D (K=0), mixed (K>0), byte-aligned, corrupt
    assert _try_ccitt(b"<< /DecodeParms << /K 0 /Columns 8 >> >>",
                      data, 4) is None
    assert _try_ccitt(b"<< /DecodeParms << /K 4 /Columns 8 >> >>",
                      data, 4) is None
    assert _try_ccitt(
        b"<< /DecodeParms << /K -1 /Columns 8 "
        b"/EncodedByteAlign true >> >>", data, 4) is None
    assert _try_ccitt(parms, b"\x00\x00\x00", 4) is None
