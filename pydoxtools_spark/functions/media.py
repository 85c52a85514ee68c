"""Deterministic media codecs for the multimodal tier — writer/reader
pairs built from public format knowledge only (the pdfparse.py strategy
applied to media):

  BMP   24-bit uncompressed Windows bitmaps (BITMAPFILEHEADER +
        BITMAPINFOHEADER, BI_RGB, bottom-up rows, 4-byte row padding)
  WAV   RIFF/WAVE canonical PCM (fmt + data chunks, 16-bit LE samples)

The reference's media chain decodes with PIL and OCRs with tesseract
(pdf_utils.py:151-161, extract_ocr.py:21-52) — neither lib is in this
sandbox, but BMP/WAV are simple enough to implement exactly, which
turns the multimodal tier from a hash-stub into a REAL
bytes -> decode -> feature pipeline for these codecs; other codecs
(png/jpeg/mp3/...) remain an explicit plug point where PIL/ffmpeg
would slot in (operators/multimodal.py decode ladder).

Features are exact integer arithmetic (no float ambiguity), so a
DuckDB oracle can recompute them from the generating parameters:
  luminance(r, g, b) = (299 r + 587 g + 114 b) // 1000
  hist16            = 16-bin luminance (or |sample| >> 11 for audio)
                      histogram, normalized by count
"""

from __future__ import annotations

import struct

import numpy as np


class MediaDecodeError(ValueError):
    pass


# -------------------------------------------------------------------- BMP

_BMP_HEADER = struct.Struct("<2sIHHI")          # magic, filesize, res, res, offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")       # BITMAPINFOHEADER


def _row_stride(width: int) -> int:
    return (3 * width + 3) & ~3


def bmp_size(width: int, height: int) -> int:
    """Exact file size of a 24-bit BI_RGB BMP — the arithmetic the
    oracle recomputes: 54-byte headers + padded rows."""
    return 54 + _row_stride(width) * height


def build_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array -> BMP bytes (bottom-up, BGR).
    Vectorized: the original per-pixel python loop was 99% of the
    pdf_render kernel's cost (36M generator calls for 300 pages —
    profiled r5); one strided numpy assignment emits the same bytes."""
    h, w = pixels.shape[0], pixels.shape[1]
    stride = _row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order + RGB -> BGR channel flip, zero row padding
    rows[:, : 3 * w] = np.ascontiguousarray(
        pixels[::-1, :, ::-1]).reshape(h, 3 * w)
    body = rows.tobytes()
    info = _BMP_INFO.pack(40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    head = _BMP_HEADER.pack(b"BM", 54 + len(body), 0, 0, 54)
    return head + info + body


def parse_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """BMP bytes -> (width, height, (h, w, 3) uint8 RGB).  Supports the
    subset the writer emits (24-bit BI_RGB); anything else raises
    MediaDecodeError — the caller's plug point for a real decoder."""
    if len(data) < 54 or data[:2] != b"BM":
        raise MediaDecodeError("not a BMP payload")
    _magic, _size, _r1, _r2, offset = _BMP_HEADER.unpack_from(data, 0)
    (hdr, w, h, _planes, bpp, comp, _isz, _xp, _yp, _cu, _ci) = \
        _BMP_INFO.unpack_from(data, 14)
    if hdr < 40 or bpp != 24 or comp != 0:
        raise MediaDecodeError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = _row_stride(w)
    if len(data) < offset + stride * h:
        raise MediaDecodeError("truncated BMP body")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1].copy()    # BGR -> RGB


def luminance_hist16(pixels: np.ndarray) -> tuple[list[float], int]:
    """(h, w, 3) RGB -> (16-bin normalized luminance histogram,
    integer mean luminance).  Integer arithmetic only."""
    p = pixels.astype(np.int64)
    lum = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    bins = np.bincount((lum >> 4).ravel(), minlength=16)[:16]
    n = lum.size or 1
    return (bins / n).tolist(), int(lum.sum() // n)


# -------------------------------------------------------------------- WAV

_RIFF = struct.Struct("<4sI4s")
_FMT = struct.Struct("<HHIIHH")


def build_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """1-D int16 array -> canonical PCM WAV bytes (mono, 16-bit LE)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = _FMT.pack(1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return _RIFF.pack(b"RIFF", 4 + len(body), b"WAVE") + body


def parse_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 sample array).  Canonical PCM
    subset only; other encodings raise MediaDecodeError."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaDecodeError("not a RIFF/WAVE payload")
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = _FMT.unpack_from(data, pos + 8)
            if audio_fmt != 1 or bits != 16 or ch != 1:
                raise MediaDecodeError(
                    f"unsupported WAV encoding (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            pcm = data[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)
    if rate is None or pcm is None:
        raise MediaDecodeError("missing fmt/data chunk")
    return rate, np.frombuffer(pcm, dtype="<i2")


def amplitude_hist16(samples: np.ndarray) -> tuple[list[float], int]:
    """int16 samples -> (16-bin |sample| histogram normalized by count,
    integer mean |sample|).  |s| in [0, 32768] -> bin = min(|s| >> 11, 15)."""
    a = np.abs(samples.astype(np.int64))
    bins = np.bincount(np.minimum(a >> 11, 15), minlength=16)[:16]
    n = a.size or 1
    return (bins / n).tolist(), int(a.sum() // n)


# ------------------------------------------------------- text raster pair

def build_text_bmp(text: str) -> bytes:
    """Deterministic 'rasterization' for the OCR plug-point tests: the
    utf-8 bytes of `text` become the red channel of row 0 (terminated by
    a 0 byte).  A real renderer would draw glyphs; this keeps the whole
    image -> decode -> batched-model -> text chain executable and
    bit-exactly checkable without font stacks."""
    payload = text.encode("utf-8") + b"\x00"
    w = len(payload)
    px = np.zeros((1, w, 3), dtype=np.uint8)
    px[0, :, 0] = np.frombuffer(payload, dtype=np.uint8)
    return build_bmp(px)


def read_text_bmp_pixels(pixels: np.ndarray) -> str:
    """The matching mock-OCR 'model' kernel: red channel of row 0 up to
    the 0 terminator -> text."""
    reds = pixels[0, :, 0].tobytes()
    end = reds.find(b"\x00")
    return reds[: end if end >= 0 else len(reds)].decode("utf-8", "replace")


# ----------------------------------------------------------------- AIFF

def _f80_encode(value: int) -> bytes:
    """Integer sample rate -> 80-bit IEEE 754 extended float (the AIFF
    COMM chunk's rate field — the one genuinely odd corner of the
    format; everything else is plain big-endian chunks)."""
    if value <= 0:
        raise ValueError(f"sample rate must be positive, got {value}")
    exp = value.bit_length() - 1
    mant = value << (63 - exp)  # explicit leading 1 in bit 63
    return struct.pack(">H", 16383 + exp) + mant.to_bytes(8, "big")


def _f80_decode(data: bytes) -> int:
    (se,) = struct.unpack(">H", data[:2])
    if se & 0x8000:
        raise MediaDecodeError("negative AIFF sample rate")
    exp = (se & 0x7FFF) - 16383
    mant = int.from_bytes(data[2:10], "big")
    if mant == 0:
        return 0
    shift = 63 - exp
    if not 0 <= shift <= 63:
        raise MediaDecodeError(f"AIFF sample rate out of range (2^{exp})")
    if mant & ((1 << shift) - 1):
        raise MediaDecodeError("non-integer AIFF sample rate")
    return mant >> shift


def build_aiff(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """1-D int16 array -> canonical AIFF bytes (mono, 16-bit PCM,
    big-endian — the WAV twin for the FORM/AIFF world)."""
    pcm = np.asarray(samples, dtype=">i2").tobytes()
    comm = struct.pack(">hLh", 1, len(pcm) // 2, 16) \
        + _f80_encode(sample_rate)
    ssnd = struct.pack(">LL", 0, 0) + pcm
    body = (b"AIFF"
            + b"COMM" + struct.pack(">L", len(comm)) + comm
            + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd)
    return b"FORM" + struct.pack(">L", len(body)) + body


def parse_aiff(data: bytes) -> tuple[int, np.ndarray]:
    """AIFF bytes -> (sample_rate, int16 samples).  Mono/stereo 16-bit
    PCM subset; AIFC compression types and other widths raise
    MediaDecodeError (the PIL/ffmpeg plug point, same contract as
    parse_wav)."""
    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] not in (
            b"AIFF", b"AIFC"):
        raise MediaDecodeError("not a FORM/AIFF payload")
    pos, rate, pcm, n_ch = 12, None, None, 1
    little = False  # AIFC 'sowt' = little-endian PCM (the Mac idiom)
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack(">L", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"COMM":
            if len(body) < 18:
                raise MediaDecodeError("short AIFF COMM chunk")
            n_ch, _frames, width = struct.unpack(">hLh", body[:8])
            if width != 16 or n_ch not in (1, 2):
                raise MediaDecodeError(
                    f"unsupported AIFF shape ({width}-bit, {n_ch}ch)")
            if len(body) >= 22:
                if body[18:22] not in (b"NONE", b"sowt"):
                    raise MediaDecodeError(
                        f"AIFC compression {body[18:22]!r} unsupported")
                little = body[18:22] == b"sowt"
            rate = _f80_decode(body[8:18])
        elif cid == b"SSND":
            if len(body) < 8:
                raise MediaDecodeError("short AIFF SSND chunk")
            (off, _block) = struct.unpack(">LL", body[:8])
            pcm = body[8 + off:]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise MediaDecodeError("AIFF missing COMM or SSND chunk")
    samples = np.frombuffer(
        pcm[: len(pcm) // 2 * 2],
        dtype="<i2" if little else ">i2").astype(np.int16)
    if n_ch == 2:  # downmix the feature path like a mono reader would
        samples = samples[: len(samples) // 2 * 2].reshape(-1, 2)
        samples = ((samples[:, 0].astype(np.int32)
                    + samples[:, 1]) // 2).astype(np.int16)
    return rate, samples
