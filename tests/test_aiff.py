"""AIFF codec pair (functions/media.py): the big-endian WAV twin —
80-bit extended-float sample rates, word-aligned chunks, stereo
downmix, containment, and the media_features kernel path."""
import struct

import numpy as np
import pytest

from pydoxtools_spark.functions.media import (
    MediaDecodeError,
    _f80_decode,
    _f80_encode,
    build_aiff,
    parse_aiff,
)


def test_f80_rates():
    # spec-known encoding: 44100 = 0x400E AC44 0000 0000 0000
    assert _f80_encode(44100).hex() == "400eac44000000000000"
    for rate in (1, 8000, 11025, 22050, 44100, 48000, 96000, 192000):
        assert _f80_decode(_f80_encode(rate)) == rate
    with pytest.raises(MediaDecodeError, match="negative"):
        _f80_decode(b"\xc0\x0e" + b"\x00" * 8)
    with pytest.raises(ValueError):
        _f80_encode(0)


def test_roundtrip_and_word_alignment():
    s = np.arange(-300, 301, dtype=np.int16)  # odd count: pad path
    rate, out = parse_aiff(build_aiff(s, 22050))
    assert rate == 22050
    np.testing.assert_array_equal(out, s)


def test_stereo_downmix_and_unsupported():
    # handcraft a stereo file: channels=2, interleaved L/R
    lr = np.array([100, 200, -50, 50], dtype=">i2")  # 2 frames
    comm = struct.pack(">hLh", 2, 2, 16) + _f80_encode(8000)
    ssnd = struct.pack(">LL", 0, 0) + lr.tobytes()
    body = (b"AIFF" + b"COMM" + struct.pack(">L", len(comm)) + comm
            + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd)
    data = b"FORM" + struct.pack(">L", len(body)) + body
    rate, out = parse_aiff(data)
    assert rate == 8000 and out.tolist() == [150, 0]
    # 8-bit width: the plug point
    bad_comm = struct.pack(">hLh", 1, 2, 8) + _f80_encode(8000)
    bad = (b"FORM" + struct.pack(">L", 30) + b"AIFF"
           + b"COMM" + struct.pack(">L", len(bad_comm)) + bad_comm)
    with pytest.raises(MediaDecodeError, match="unsupported AIFF"):
        parse_aiff(bad)
    with pytest.raises(MediaDecodeError, match="not a FORM"):
        parse_aiff(b"RIFF1234WAVE")
    with pytest.raises(MediaDecodeError, match="missing COMM"):
        parse_aiff(b"FORM" + struct.pack(">L", 4) + b"AIFF")


def test_media_features_decodes_aiff(spark):
    from pydoxtools_spark.operators.multimodal import media_features

    good = build_aiff(np.full(400, 1234, dtype=np.int16), 16000)
    rows = [("a1", "audio", bytearray(good), None),
            ("a2", "audio", bytearray(good[:20]), None)]
    media = spark.createDataFrame(
        rows, "media_ref string, media_type string, content binary, "
              "meta map<string,string>")
    out = {r["media_ref"]: r for r in media_features(media).collect()}
    assert out["a1"]["sample_rate"] == 16000
    assert out["a1"]["mean_level"] == 1234
    assert out["a1"]["duration_ms"] == 400 * 1000 // 16000
    assert out["a2"]["decode_error"] is not None


def test_aifc_sowt_little_endian():
    """AIFC 'sowt' marks LITTLE-endian PCM -- parsing it big-endian
    would byte-swap every sample."""
    s = np.array([1, -2, 300, -32768], dtype="<i2")
    comm = (struct.pack(">hLh", 1, len(s), 16) + _f80_encode(8000)
            + b"sowt" + b"\x05sowt\x00")  # compression id + pstring
    ssnd = struct.pack(">LL", 0, 0) + s.tobytes()
    body = (b"AIFC" + b"COMM" + struct.pack(">L", len(comm)) + comm
            + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd)
    data = b"FORM" + struct.pack(">L", len(body)) + body
    rate, out = parse_aiff(data)
    assert rate == 8000
    np.testing.assert_array_equal(out, s.astype(np.int16))
