"""Content-defined chunking (Gear rolling hash) for binary dedup.

Text dedup (operators/dedup.py) works on words; media/binary corpora
dedup at the STORAGE level instead — split every blob at
content-defined boundaries so a shared run of bytes produces the same
chunks regardless of its offset in the file, then hash-dedup the
chunks (the LBFS/FastCDC recipe every dedup store uses).  An insert
near the start of a file shifts every fixed-size block but leaves
all content-defined chunks after the next boundary identical.

Gear hash: h_i = (2 * h_{i-1} + GEAR[b_i]) mod 2^64 — a shift
register whose taps vanish after 64 steps, so the hash at any
position depends ONLY on the last 64 bytes.  That locality is the
load-bearing property (it makes boundaries content-local), and it is
what the fixture generators exploit: a 64-byte marker forces a
boundary no matter what precedes it.

The per-position hash is a 64-tap correlation, so it vectorizes:
64 shifted uint64 adds over the whole buffer (numpy wraparound IS the
mod), then the sparse min/max walk touches only candidate positions.
"""
from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _gear_table() -> np.ndarray:
    # deterministic table: 8 bytes of sha256("gear:<i>") per entry —
    # reproducible across sessions/engines, no RNG state involved
    vals = [int.from_bytes(hashlib.sha256(b"gear:%d" % i).digest()[:8],
                           "big") for i in range(256)]
    return np.array(vals, dtype=np.uint64)


GEAR = _gear_table()
WINDOW = 64  # taps older than this shift out of the 64-bit register


def gear_hashes(data: bytes) -> np.ndarray:
    """Per-position rolling hash h_i (uint64 array, one per byte)."""
    b = np.frombuffer(data, dtype=np.uint8)
    g = GEAR[b]
    h = np.zeros(len(b), dtype=np.uint64)
    for k in range(min(WINDOW, len(b))):
        # contribution of the byte k steps back, shifted k times
        h[k:] += g[: len(b) - k] << np.uint64(k)
    return h


def chunk_boundaries(data: bytes, mask_bits: int = 13,
                     min_size: int = 2048,
                     max_size: int = 65536) -> list[int]:
    """Chunk END offsets (exclusive) of `data`: a boundary fires where
    the rolling hash has `mask_bits` low zero bits, at least min_size
    after the previous one; max_size forces a split.  The final chunk
    ends at EOF."""
    if min_size < 1 or max_size < min_size:
        raise ValueError(f"bad sizes min={min_size} max={max_size}")
    n = len(data)
    if n == 0:
        return []
    mask = np.uint64((1 << mask_bits) - 1)
    cand = np.flatnonzero((gear_hashes(data) & mask) == 0) + 1
    out: list[int] = []
    last = 0
    for c in cand.tolist():
        while c - last > max_size:  # forced splits fill long gaps
            out.append(last + max_size)
            last += max_size
        if c - last >= min_size:
            out.append(c)
            last = c
    while n - last > max_size:
        out.append(last + max_size)
        last += max_size
    if last < n:
        out.append(n)
    return out


_MARKERS: dict[tuple[int, bytes], bytes] = {}


def find_boundary_marker(mask_bits: int = 16,
                         prefix: bytes = b"CDC-") -> bytes:
    """Deterministically search a 64-byte printable marker whose gear
    hash (which depends on the marker alone — WINDOW locality) ends in
    `mask_bits` zero bits: appending it to ANY stream forces a chunk
    boundary at its end.  Fixture/oracle tool: generators plant it at
    known offsets so chunk layouts are analytic."""
    got = _MARKERS.get((mask_bits, prefix))
    if got is not None:
        return got
    mask = (1 << mask_bits) - 1
    width = WINDOW - len(prefix)
    for k in range(1 << (mask_bits + 4)):
        marker = prefix + b"%0*d" % (width, k)
        h = 0
        for byte in marker:
            h = ((h << 1) + int(GEAR[byte])) & 0xFFFFFFFFFFFFFFFF
        if h & mask == 0:
            _MARKERS[(mask_bits, prefix)] = marker
            return marker
    raise RuntimeError(f"no marker found for mask_bits={mask_bits}")
