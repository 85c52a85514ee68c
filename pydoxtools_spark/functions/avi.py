"""From-scratch AVI (RIFF) video container reader/writer.

Completes the multimodal column story: video blobs get typed metadata
(width/height/fps/frame count) AND a decodable-frame subset, so the
frame-sampling plumbing (multimodal.frame_sample_plan) drives a REAL
per-frame decode instead of a stub.  The reference leans on ffmpeg
for this seat; the from-scratch subset here is uncompressed DIB
('00db') frames — the BMP body format media.py already speaks —
which keeps fixtures analytic while real codecs (H.264 etc.) remain
the contained plug point, same contract as every other codec module.

Subset: single video stream, 24-bit bottom-up BGR DIB frames, the
canonical hdrl/movi/idx1 layout.  parse_avi_frame gives random access
by frame index (movi chunk scan — O(frames) over the byte offsets,
no decode of skipped frames), which is what a distributed sampler
needs: each task decodes only its own frame indexes.
"""
from __future__ import annotations

import struct

import numpy as np

from .media import MediaDecodeError


def _row_stride(w: int) -> int:
    return (3 * w + 3) & ~3


def build_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> AVI bytes (single 'vids'
    stream, uncompressed 24-bit DIB, deterministic layout)."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3 or fr.shape[0] < 1:
        raise ValueError(f"need (n, h, w, 3) frames, got {fr.shape}")
    if fps < 1:
        raise ValueError(f"fps must be >= 1, got {fps}")
    n, h, w = fr.shape[0], fr.shape[1], fr.shape[2]
    stride = _row_stride(w)

    def dib(frame: np.ndarray) -> bytes:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : 3 * w] = np.ascontiguousarray(
            frame[::-1, :, ::-1]).reshape(h, 3 * w)
        return rows.tobytes()

    frame_bytes = stride * h
    avih = struct.pack("<10I", 1_000_000 // fps, frame_bytes * fps, 0,
                       0x10, n, 0, 1, frame_bytes, w, h) + b"\x00" * 16
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, n, frame_bytes,
                                            0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       frame_bytes, 2835, 2835, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi_body = b"".join(chunk(b"00db", dib(fr[i])) for i in range(n))
    movi = lst(b"movi", movi_body)
    # idx1: offsets relative to the 'movi' fourcc position + 4
    idx_entries = bytearray()
    off = 4
    for i in range(n):
        idx_entries += b"00db" + struct.pack("<III", 0x10, off,
                                             frame_bytes)
        off += 8 + frame_bytes + (frame_bytes & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx_entries))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunks(data: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, size) over a RIFF chunk run."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi_meta(data: bytes) -> dict:
    """AVI bytes -> {width, height, fps, n_frames, frame_offsets}.
    frame_offsets are absolute byte positions of each video frame's
    chunk body — the random-access index parse_avi_frame uses."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise MediaDecodeError("not a RIFF/AVI payload")
    meta: dict = {}
    offsets: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        for cid, body, size in _chunks(data, pos, end):
            if cid == b"LIST":
                kind = data[body:body + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(body + 4, body + size)
            elif cid == b"avih":
                if size < 40:
                    raise MediaDecodeError("short avih header")
                v = struct.unpack_from("<10I", data, body)
                meta.update(n_frames=v[4], width=v[8], height=v[9])
            elif cid == b"strh" and data[body:body + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", data, body + 20)
                if scale:
                    meta["fps"] = rate // scale
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                offsets.append((body, size))

    try:
        walk(12, len(data))
    except (struct.error, IndexError) as ex:
        raise MediaDecodeError(f"corrupt AVI structure: {ex}") from ex
    if not meta.get("width") or not meta.get("height"):
        raise MediaDecodeError("AVI missing avih dimensions")
    meta.setdefault("fps", 0)
    meta["frame_offsets"] = offsets
    meta["n_frames"] = meta.get("n_frames") or len(offsets)
    return meta


def parse_avi_frame(data: bytes, idx: int,
                    meta: dict | None = None) -> np.ndarray:
    """Decode frame `idx` -> (h, w, 3) uint8 RGB.  Only the
    uncompressed-DIB subset decodes ('00db' or a '00dc' whose size
    matches the DIB geometry); compressed codecs raise — the ffmpeg
    plug point."""
    meta = meta or parse_avi_meta(data)
    offs = meta["frame_offsets"]
    if not 0 <= idx < len(offs):
        raise MediaDecodeError(
            f"frame {idx} out of range ({len(offs)} frames)")
    body, size = offs[idx]
    w, h = meta["width"], meta["height"]
    stride = _row_stride(w)
    if size != stride * h:
        raise MediaDecodeError(
            f"frame {idx} is not uncompressed DIB "
            f"({size} bytes != {stride * h}) — plug a real codec")
    rows = np.frombuffer(data[body:body + size],
                         dtype=np.uint8).reshape(h, stride)
    return np.ascontiguousarray(rows[::-1, : 3 * w]
                                .reshape(h, w, 3)[:, :, ::-1])
