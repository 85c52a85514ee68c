"""From-scratch TIFF container reader/writer.

Scanned documents travel as TIFF about as often as image-only PDF,
and the reference's pipeline accepts them through PIL's TIFF plugin
(the `Image.open` seat behind extract_files).  Same from-scratch
codec strategy as media.py / jpeg.py / png.py / ccitt.py: a
writer/reader pair whose shared layout makes round-trips exact by
construction, with the writer doubling as the fixture generator.
TIFF is mostly a CONTAINER — the heavy lifting reuses codecs this
package already ships: Compression 4 delegates to the CCITT G4 codec
(functions/ccitt.py) and Compression 5 to the LZW coder pdfparse
implements for /LZWDecode (ISO 32000 calls it "the TIFF variant" —
MSB-first, EarlyChange; functions/pdfparse.py:965).

Reader subset: classic TIFF (magic 42), II and MM byte orders,
strip-organized (tiles raise), Compression 1 (none), 4 (CCITT G4),
5 (LZW + Predictor 2 horizontal differencing), 32773 (PackBits);
PhotometricInterpretation 0/1 over 1-bit or 8-bit samples and 2
(RGB, 8-bit); multi-strip via RowsPerStrip.  Anything else raises
MediaDecodeError — the contained plug point, same contract as every
other codec in the ladder.

Writer: deterministic layout `header | strip data | out-of-line tag
values | IFD`, so the uncompressed sizes are closed-form for oracle
SQL: RGB = 128 + 3wh, 8-bit gray = 122 + wh (9 tags, single strip).
"""
from __future__ import annotations

import struct

import numpy as np

from .media import MediaDecodeError

_II = b"II*\x00"
_MM = b"MM\x00*"

# IFD tag ids (TIFF 6.0 baseline)
_T_WIDTH, _T_HEIGHT, _T_BPS, _T_COMP = 256, 257, 258, 259
_T_PHOTO, _T_STRIP_OFF, _T_SPP = 262, 273, 277
_T_RPS, _T_STRIP_CNT, _T_PREDICTOR = 278, 279, 317

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


# ------------------------------------------------------------ PackBits

def packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                raise MediaDecodeError("truncated PackBits literal")
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:  # replicate next byte 257-c times
            if i >= n:
                raise MediaDecodeError("truncated PackBits replicate")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op per the spec
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: replicate runs of >= 3, literals otherwise
    (the standard encoder shape; deterministic)."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literal(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(data[j:j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            flush_literal(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literal(n)
    return bytes(out)


# -------------------------------------------------------------- reader

def parse_tiff(data: bytes) -> tuple[int, int, np.ndarray]:
    """TIFF bytes -> (width, height, (h, w, 3) uint8 RGB).  First IFD
    only (multi-page TIFFs decode their first page, PIL's default)."""
    if data[:4] == _II:
        e = "<"
    elif data[:4] == _MM:
        e = ">"
    else:
        raise MediaDecodeError("not a TIFF payload")
    try:
        return _parse_ifd(data, e)
    except (struct.error, IndexError, KeyError, ValueError) as ex:
        raise MediaDecodeError(f"corrupt TIFF structure: {ex}") from ex


def read_ifd(data: bytes, e: str, ifd_off: int) -> dict:
    """One TIFF IFD -> {tag: list[int] | bytes}.  BYTE/SHORT/LONG and
    RATIONAL (type 5, as (num, den) pairs flattened) decode to int
    lists, ASCII (type 2) to the raw bytes minus the NUL terminator.
    Shared by the TIFF image reader and the EXIF parser (EXIF is this
    exact structure inside a JPEG APP1 segment)."""
    (n_tags,) = struct.unpack_from(e + "H", data, ifd_off)
    tags: dict[int, list[int] | bytes] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, off)
        if typ == 5:  # RATIONAL: cnt pairs of u32
            vo = struct.unpack_from(e + "I", data, off + 8)[0]
            tags[tag] = list(struct.unpack_from(e + "I" * (2 * cnt),
                                                data, vo))
            continue
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        vo = off + 8 if size * cnt <= 4 else \
            struct.unpack_from(e + "I", data, off + 8)[0]
        if typ == 2:
            tags[tag] = bytes(data[vo:vo + cnt]).rstrip(b"\x00")
            continue
        tags[tag] = list(struct.unpack_from(e + _TYPE_FMT[typ] * cnt,
                                            data, vo))
    return tags


def _parse_ifd(data: bytes, e: str) -> tuple[int, int, np.ndarray]:
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    tags = read_ifd(data, e, ifd_off)
    if 322 in tags or 323 in tags:
        raise MediaDecodeError("tiled TIFF unsupported (strip subset)")
    if tags.get(284, [1])[0] != 1:
        # planar RGB would decode to channel-scrambled garbage —
        # refuse loudly, the contained-plug-point contract
        raise MediaDecodeError("planar TIFF unsupported (chunky subset)")
    if tags.get(266, [1])[0] != 1:
        raise MediaDecodeError(
            "FillOrder 2 (LSB-first fax) unsupported")
    width, height = tags[_T_WIDTH][0], tags[_T_HEIGHT][0]
    if width < 1 or height < 1:
        raise MediaDecodeError(f"bad TIFF dimensions {width}x{height}")
    comp = tags.get(_T_COMP, [1])[0]
    photo = tags.get(_T_PHOTO, [1])[0]
    spp = tags.get(_T_SPP, [1])[0]
    bps = tags.get(_T_BPS, [1] * spp)
    rps = tags.get(_T_RPS, [height])[0] or height
    pred = tags.get(_T_PREDICTOR, [1])[0]
    offs, cnts = tags[_T_STRIP_OFF], tags[_T_STRIP_CNT]
    if len(offs) != len(cnts):
        raise MediaDecodeError("strip offset/count mismatch")

    bilevel = spp == 1 and bps == [1]
    if not (bilevel or (spp == 1 and bps == [8] and photo in (0, 1))
            or (spp == 3 and bps == [8, 8, 8] and photo == 2)):
        raise MediaDecodeError(
            f"unsupported TIFF shape (photo={photo}, spp={spp}, "
            f"bps={bps}) — plug a real decoder")

    rows_out: list[np.ndarray] = []
    for s, (o, c) in enumerate(zip(offs, cnts)):
        raw = bytes(data[o:o + c])
        if len(raw) != c:
            raise MediaDecodeError("truncated TIFF strip")
        n_rows = min(rps, height - s * rps)
        if n_rows <= 0:
            raise MediaDecodeError("more strips than image rows")
        if comp == 4:
            if not bilevel:
                raise MediaDecodeError("G4 strip in a non-bilevel TIFF")
            from .ccitt import CcittError, parse_ccitt_g4
            try:
                ink = parse_ccitt_g4(raw, width, n_rows)
            except CcittError as ex:
                raise MediaDecodeError(f"bad G4 strip: {ex}") from ex
            bits = ink.astype(np.uint8)  # 1 = black run
        else:
            if comp == 1:
                payload = raw
            elif comp == 5:
                from .pdfparse import PdfParseError, _lzw_decode
                try:
                    payload = _lzw_decode(raw)
                except PdfParseError as ex:
                    raise MediaDecodeError(
                        f"bad LZW strip: {ex}") from ex
            elif comp == 32773:
                payload = packbits_decode(raw)
            else:
                raise MediaDecodeError(
                    f"unsupported TIFF compression {comp}")
            row_bytes = (width * spp * bps[0] + 7) // 8
            if len(payload) < row_bytes * n_rows:
                raise MediaDecodeError("short TIFF strip payload")
            arr = np.frombuffer(
                payload[: row_bytes * n_rows], dtype=np.uint8
            ).reshape(n_rows, row_bytes)
            if pred == 2:
                if bps != [8] * spp:
                    raise MediaDecodeError("predictor on non-8-bit")
                arr = (arr.reshape(n_rows, width, spp)
                       .astype(np.int64).cumsum(axis=1) % 256
                       ).astype(np.uint8).reshape(n_rows, row_bytes)
            if bilevel:
                bits = np.unpackbits(arr, axis=1)[:, :width]
            else:
                bits = arr
        if bilevel:
            # photometric 0 = WhiteIsZero: sample 0 renders white
            white0 = photo == 0
            gray = np.where(bits == (1 if white0 else 0), 0, 255)
            rows_out.append(
                np.repeat(gray[:, :, None], 3, axis=2).astype(np.uint8))
        elif spp == 1:
            g = 255 - bits if photo == 0 else bits
            rows_out.append(np.repeat(
                g.reshape(n_rows, width)[:, :, None], 3, axis=2))
        else:
            rows_out.append(bits.reshape(n_rows, width, 3))
    px = np.concatenate(rows_out, axis=0)
    if px.shape[0] != height:
        raise MediaDecodeError(
            f"strip rows {px.shape[0]} != height {height}")
    return width, height, np.ascontiguousarray(px)


# -------------------------------------------------------------- writer

def _encode_strip(payload: bytes, compression: str, width: int,
                  spp: int, predictor: int) -> bytes:
    if compression == "none":
        return payload
    if compression == "packbits":
        return packbits_encode(payload)
    if compression == "lzw":
        from .pdfparse import _lzw_encode
        if predictor == 2:
            arr = np.frombuffer(payload, dtype=np.uint8).reshape(
                -1, width, spp).astype(np.int64)
            arr[:, 1:] -= arr[:, :-1].copy()
            payload = (arr % 256).astype(np.uint8).tobytes()
        return _lzw_encode(payload)
    raise ValueError(f"unknown compression {compression!r}")


def _emit(pixels_strips: list[bytes], width: int, height: int,
          bps: list[int], comp_id: int, photo: int, spp: int,
          rps: int, byte_order: str, predictor: int) -> bytes:
    e = "<" if byte_order == "II" else ">"
    head = _II if byte_order == "II" else _MM
    data = b"".join(pixels_strips)
    extra = bytearray()  # out-of-line tag values, placed after data
    data_start = 8
    extra_start = data_start + len(data)

    tags: list[tuple[int, int, int, list[int]]] = []

    def add(tag: int, typ: int, vals: list[int]) -> None:
        tags.append((tag, typ, len(vals), vals))

    def offsets() -> list[int]:
        out, pos = [], data_start
        for s in pixels_strips:
            out.append(pos)
            pos += len(s)
        return out

    add(_T_WIDTH, 3, [width])
    add(_T_HEIGHT, 3, [height])
    add(_T_BPS, 3, bps)
    add(_T_COMP, 3, [comp_id])
    add(_T_PHOTO, 3, [photo])
    add(_T_STRIP_OFF, 4, offsets())
    add(_T_SPP, 3, [spp])
    add(_T_RPS, 3, [rps])
    add(_T_STRIP_CNT, 4, [len(s) for s in pixels_strips])
    if predictor == 2:
        add(_T_PREDICTOR, 3, [predictor])
    tags.sort()  # IFD entries must be tag-ordered

    entries = bytearray()
    for tag, typ, cnt, vals in tags:
        size = _TYPE_SIZE[typ] * cnt
        packed = struct.pack(e + _TYPE_FMT[typ] * cnt, *vals)
        if size <= 4:
            val_field = packed + b"\x00" * (4 - size)
        else:
            val_field = struct.pack(e + "I", extra_start + len(extra))
            extra += packed
        entries += struct.pack(e + "HHI", tag, typ, cnt) + val_field
    ifd_off = extra_start + len(extra)
    ifd = struct.pack(e + "H", len(tags)) + bytes(entries) \
        + struct.pack(e + "I", 0)
    return head + struct.pack(e + "I", ifd_off) + data + bytes(extra) + ifd


def build_tiff(pixels: np.ndarray, compression: str = "none",
               byte_order: str = "II", rows_per_strip: int | None = None,
               predictor: int = 1) -> bytes:
    """(h, w, 3) RGB or (h, w) gray uint8 -> classic TIFF.  Layout is
    deterministic (header | strips | out-of-line values | IFD), so the
    uncompressed single-strip sizes are closed-form: 128 + 3wh (RGB),
    122 + wh (gray)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        spp, photo, bps = 1, 1, [8]
    elif px.ndim == 3 and px.shape[2] == 3:
        spp, photo, bps = 3, 2, [8, 8, 8]
    else:
        raise ValueError(f"need (h,w) gray or (h,w,3) RGB, "
                         f"got {px.shape}")
    h, w = px.shape[0], px.shape[1]
    rps = rows_per_strip or h
    comp_id = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    if predictor == 2 and compression != "lzw":
        raise ValueError("predictor 2 is an LZW option")
    strips = [
        _encode_strip(
            np.ascontiguousarray(px[y:y + rps]).tobytes(),
            compression, w, spp, predictor)
        for y in range(0, h, rps)
    ]
    return _emit(strips, w, h, bps, comp_id, photo, spp, rps,
                 byte_order, predictor)


def build_tiff_g4(ink: np.ndarray, byte_order: str = "II",
                  rows_per_strip: int | None = None) -> bytes:
    """(h, w) bool ink (True = black) -> bilevel G4 TIFF, photometric
    0 (WhiteIsZero — the fax convention, so ink decodes black)."""
    from .ccitt import build_ccitt_g4

    ink = np.asarray(ink).astype(bool)
    h, w = ink.shape
    rps = rows_per_strip or h
    strips = [build_ccitt_g4(ink[y:y + rps])
              for y in range(0, h, rps)]
    return _emit(strips, w, h, [1], 4, 0, 1, rps, byte_order, 1)
