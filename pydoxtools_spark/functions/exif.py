"""EXIF metadata: parse, write (fixtures), and PII-scrub for JPEG.

Image corpora carry PII in METADATA, not pixels: EXIF GPS
coordinates, device serials, timestamps.  Every published
image-dataset pipeline strips or filters this before training — the
image-side twin of curation.scrub_pii.  EXIF is a TIFF IFD structure
(functions/tiff.read_ifd) embedded in a JPEG APP1 segment
('Exif\\0\\0' + TIFF header), so the parser here is mostly segment
plumbing.

Implemented:
  - `parse_exif(jpeg)` -> flat dict of the common IFD0 tags (Make,
    Model, DateTime, Orientation, Software) + `gps` (decimal-degree
    lat/lon from the GPS sub-IFD rationals) when present.
  - `build_exif_app1(...)` -> a well-formed APP1 payload (fixture
    twin; deterministic layout, optional GPS sub-IFD).
  - `strip_jpeg_metadata(jpeg)` -> (clean_jpeg, removed_bytes):
    drops APP1/APP13/COM segments (EXIF, IPTC, comments) by segment
    walk — the entropy-coded image data is untouched, so the clean
    file decodes pixel-identically.  This is byte surgery, not
    re-encode: lossless, cheap, and safe for any baseline/progressive
    JPEG because segment framing is codec-independent.
"""
from __future__ import annotations

import struct

from .media import MediaDecodeError

_IFD0_TAGS = {271: "make", 272: "model", 274: "orientation",
              305: "software", 306: "datetime"}
_GPS_IFD = 34853
_EXIF_IFD = 34665

# JPEG segments that carry only metadata: APP1 (EXIF/XMP), APP13
# (IPTC/Photoshop), COM (comments).  APP0 (JFIF) stays — some
# decoders want it; it carries no PII.
_META_MARKERS = {0xE1, 0xED, 0xFE}


def _jpeg_segments(data: bytes):
    """Yield (marker, start, total_len) for each JPEG segment up to
    SOS; the entropy-coded stream after SOS is opaque."""
    if data[:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise MediaDecodeError(f"bad JPEG marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        yield marker, pos, 2 + seg_len
        if marker == 0xDA:  # SOS: entropy data follows
            return
        pos += 2 + seg_len


def _rat(vals: list[int], i: int) -> float:
    num, den = vals[2 * i], vals[2 * i + 1]
    return num / den if den else 0.0


def parse_exif(data: bytes) -> dict:
    """JPEG bytes -> flat EXIF dict ({} when no EXIF APP1).  GPS
    rationals reduce to decimal degrees rounded to 6 places (about
    0.1 m — the precision every mapping pipeline uses)."""
    from .tiff import read_ifd

    for marker, start, total in _jpeg_segments(data):
        if marker != 0xE1 or data[start + 4:start + 10] != b"Exif\x00\x00":
            continue
        t = bytes(data[start + 10:start + total])  # the TIFF structure
        if t[:4] == b"II*\x00":
            e = "<"
        elif t[:4] == b"MM\x00*":
            e = ">"
        else:
            raise MediaDecodeError("bad EXIF TIFF header")
        (ifd0_off,) = struct.unpack_from(e + "I", t, 4)
        ifd0 = read_ifd(t, e, ifd0_off)
        out: dict = {}
        for tag, name in _IFD0_TAGS.items():
            v = ifd0.get(tag)
            if isinstance(v, bytes):
                out[name] = v.decode("latin-1")
            elif v:
                out[name] = v[0]
        if _GPS_IFD in ifd0:
            gps = read_ifd(t, e, ifd0[_GPS_IFD][0])
            lat = gps.get(2)
            lon = gps.get(4)
            if lat and lon:
                latd = sum(_rat(lat, i) / 60 ** i for i in range(3))
                lond = sum(_rat(lon, i) / 60 ** i for i in range(3))
                if gps.get(1) == b"S":
                    latd = -latd
                if gps.get(3) == b"W":
                    lond = -lond
                out["gps"] = (round(latd, 6), round(lond, 6))
        return out
    return {}


def build_exif_app1(make: str = "", model: str = "",
                    datetime: str = "", orientation: int = 1,
                    gps: tuple[float, float] | None = None,
                    pad_to: int | None = None) -> bytes:
    """Deterministic APP1 segment bytes (marker + length + payload)
    for fixtures: little-endian TIFF, IFD0 with the common tags, an
    optional GPS sub-IFD (degrees/minutes/seconds rationals), padded
    with zeros to `pad_to` total bytes when given (so fixture sizes
    are closed-form)."""
    entries: list[tuple[int, int, int, bytes]] = []  # tag,typ,cnt,val
    extra = bytearray()

    def ascii_tag(tag: int, s: str) -> None:
        raw = s.encode("latin-1") + b"\x00"
        entries.append((tag, 2, len(raw), raw))

    if make:
        ascii_tag(271, make)
    if model:
        ascii_tag(272, model)
    entries.append((274, 3, 1, struct.pack("<H", orientation)))
    if datetime:
        ascii_tag(306, datetime)

    gps_block = b""
    if gps is not None:
        lat, lon = gps

        def dms(v: float) -> bytes:
            v = abs(v)
            d = int(v)
            m = int((v - d) * 60)
            s = round(((v - d) * 60 - m) * 60 * 10000)
            return struct.pack("<6I", d, 1, m, 1, s, 10000)

        # GPS IFD built at a known offset AFTER ifd0 (computed below)
        gps_entries = [
            (1, 2, 2, (b"S\x00" if lat < 0 else b"N\x00")),
            (2, 5, 3, dms(lat)),
            (3, 2, 2, (b"W\x00" if lon < 0 else b"E\x00")),
            (4, 5, 3, dms(lon)),
        ]
        entries.append((_GPS_IFD, 4, 1, None))  # placeholder value

    def emit_ifd(ents, base_off: int) -> bytes:
        # layout: count + entries + next(0) + out-of-line values
        head_len = 2 + 12 * len(ents) + 4
        body = bytearray()
        out = bytearray(struct.pack("<H", len(ents)))
        for tag, typ, cnt, val in sorted(ents):
            if val is None:  # resolved by caller (sub-IFD pointer)
                raise ValueError("unresolved placeholder")
            size = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}[typ] * cnt
            if size <= 4:
                field = val + b"\x00" * (4 - size)
            else:
                field = struct.pack("<I", base_off + head_len + len(body))
                body += val
            out += struct.pack("<HHI", tag, typ, cnt) + field
        out += struct.pack("<I", 0) + body
        return bytes(out)

    # two-pass: size ifd0 (with gps pointer resolved to just-after)
    def ifd0_bytes(gps_off: int) -> bytes:
        resolved = [(t, ty, c, struct.pack("<I", gps_off)
                     if v is None else v) for t, ty, c, v in entries]
        return emit_ifd(resolved, 8)

    probe = ifd0_bytes(0)
    gps_off = 8 + len(probe)
    tiff = b"II*\x00" + struct.pack("<I", 8) + ifd0_bytes(gps_off)
    if gps is not None:
        tiff += emit_ifd(gps_entries, gps_off)
    payload = b"Exif\x00\x00" + tiff
    if pad_to is not None:
        need = pad_to - (len(payload) + 4)
        if need < 0:
            raise ValueError(f"pad_to {pad_to} smaller than segment")
        payload += b"\x00" * need
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (before APP0) — the
    fixture writer's hook; real cameras put it in the same place."""
    if jpeg[:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]


def strip_jpeg_metadata(data: bytes) -> tuple[bytes, int]:
    """Drop metadata segments (APP1/APP13/COM) -> (clean_jpeg,
    removed_bytes).  Pure segment surgery: pixels and every
    decode-relevant table are untouched."""
    drops: list[tuple[int, int]] = []
    for marker, start, total in _jpeg_segments(data):
        if marker in _META_MARKERS:
            drops.append((start, total))
    if not drops:
        return data, 0
    out = bytearray()
    pos = 0
    for start, total in drops:
        out += data[pos:start]
        pos = start + total
    out += data[pos:]
    return bytes(out), sum(t for _, t in drops)
