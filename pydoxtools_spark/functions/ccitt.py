"""From-scratch CCITT Group 4 (ITU-T T.6, "MMR") fax codec.

Scanned-document PDFs embed their page images as /CCITTFaxDecode
streams more often than any codec except /DCTDecode; the reference
surfaces those images by delegating to pdfminer (pdf_utils.py:286-398)
which in turn ships a CCITT decoder.  This engine keeps the same
from-scratch codec strategy as media.py (BMP/WAV), jpeg.py (baseline
JPEG) and png.py: a writer/reader pair whose shared tables make
round-trips exact BY CONSTRUCTION, with the writer doubling as the
fixture generator so driver oracles can state decoded pixel values
analytically.

Scope: two-dimensional (K < 0) coding only — the mode every PDF
producer this decade emits (pure G4/MMR; no EOL-per-row G3 mixing,
no /EncodedByteAlign).  1-D (K = 0) and mixed (K > 0) streams stay
plug-in passthrough in pdfparse.extract_pdf_images, same contract as
JBIG2/JPX: the Image element and its bytes must not vanish just
because the codec is external.

Bit semantics: the T.6 algorithm itself is defined over alternating
WHITE/BLACK runs (each line starts with an imaginary white changing
element), so `build_ccitt_g4`/`parse_ccitt_g4` speak (h, w) ink
arrays with True = black run pixel.  How those runs map to decoded
BITS (/BlackIs1) and then to gray (/Decode) is a PDF-filter concern
layered on top — `g4_to_gray` implements exactly that chain so the
pdfparse wiring and tests share one definition.

Performance shape: the decoder is pure python over sparse
changing-element lists (cost ~ #transitions, not #pixels) inside the
same Arrow-batched mapInPandas kernels as every other codec; a full
1728x2200 scanned page decodes in tens of ms, amortized across the
partition's documents.  Encoding exists for fixtures and sinks, not
hot paths.
"""
from __future__ import annotations

from bisect import bisect_right

import numpy as np

# ------------------------------------------------------------- tables
# ITU-T T.4 §2 run-length code words (shared by T.6 horizontal mode).
# Written as bit-strings for auditability; compiled to (value, nbits)
# at import.  test_ccitt asserts prefix-freeness of each color's full
# set — the structural property a transcription error would break.

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
}

_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}

_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}

_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111",
    1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011",
    1664: "0000001100100", 1728: "0000001100101",
}

# Extended make-up codes 1792-2560 (T.4 table 4) are common to both
# colors; runs beyond 2560+63 chain multiple make-ups.
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 vertical/horizontal/pass mode code words (§2.2.4) + EOL.
_MODE_BITS = {
    "V0": "1", "VR1": "011", "VL1": "010", "H": "001", "P": "0001",
    "VR2": "000011", "VL2": "000010", "VR3": "0000011",
    "VL3": "0000010", "EOL": "000000000001",
}


def _compile(table: dict) -> dict:
    return {k: (int(v, 2), len(v)) for k, v in table.items()}


_ENC_RUNS = (  # [color][runlen] -> (value, nbits); color 0 white
    {**_compile(_WHITE_TERM), **_compile(_WHITE_MAKEUP),
     **_compile(_EXT_MAKEUP)},
    {**_compile(_BLACK_TERM), **_compile(_BLACK_MAKEUP),
     **_compile(_EXT_MAKEUP)},
)
_DEC_RUNS = (  # [color][(nbits, value)] -> runlen
    {(n, v): run for run, (v, n) in _ENC_RUNS[0].items()},
    {(n, v): run for run, (v, n) in _ENC_RUNS[1].items()},
)
_ENC_MODES = _compile(_MODE_BITS)
_DEC_MODES = {(n, v): m for m, (v, n) in _ENC_MODES.items()}
_MODE_LENS = sorted({n for _, (v, n) in _ENC_MODES.items()})
_RUN_LENS = tuple(sorted({n for d in _DEC_RUNS for (n, _v) in d}))


class CcittError(ValueError):
    """Malformed or out-of-subset G4 stream (caller contains it)."""


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | value
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def done(self) -> bytes:
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
            self.acc = self.n = 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def peek(self, n: int) -> int | None:
        if self.pos + n > self.nbits:
            return None
        out = 0
        p = self.pos
        for _ in range(n):
            out = (out << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        return out

    def skip(self, n: int) -> None:
        self.pos += n


def _changes(row: np.ndarray) -> list[int]:
    """Changing-element positions of a bool row (imaginary white
    before pixel 0): even indexes are white->black transitions."""
    pad = np.empty(len(row) + 1, dtype=bool)
    pad[0] = False
    pad[1:] = row
    return np.flatnonzero(pad[1:] != pad[:-1]).tolist()


def _b1b2(ref: list[int], a0: int, color: int, width: int) -> tuple[int, int]:
    """First changing element on the reference line right of a0 with
    color opposite to a0's (T.6 §2.2.1), and the one after it."""
    j = bisect_right(ref, a0)
    if j % 2 != color:  # parity: even entries flip white->black
        j += 1
    b1 = ref[j] if j < len(ref) else width
    b2 = ref[j + 1] if j + 1 < len(ref) else width
    return b1, b2


def _write_run(w: _BitWriter, run: int, color: int) -> None:
    enc = _ENC_RUNS[color]
    while run >= 64:
        # make-up codes stop at 2560; longer runs chain them.  A
        # make-up is ALWAYS followed by a terminating code (T.4 §2.1),
        # which for multiple-of-64 runs is the zero-run code.
        step = min(2560, (run >> 6) << 6)
        v, n = enc[step]
        w.write(v, n)
        run -= step
    v, n = enc[run]
    w.write(v, n)


def build_ccitt_g4(ink: np.ndarray) -> bytes:
    """(h, w) bool/int array (True = black) -> pure-G4 (K < 0) bytes,
    EOFB-terminated, zero-padded to a byte boundary."""
    ink = np.asarray(ink).astype(bool)
    if ink.ndim != 2 or ink.shape[0] < 1 or ink.shape[1] < 1:
        raise CcittError(f"need a (h, w) bitmap, got shape {ink.shape}")
    h, width = ink.shape
    w = _BitWriter()
    ref: list[int] = []  # imaginary all-white reference line
    for y in range(h):
        cur = _changes(ink[y])
        a0, color, k = -1, 0, 0
        while a0 < width:
            a1 = cur[k] if k < len(cur) else width
            b1, b2 = _b1b2(ref, a0, color, width)
            if b2 < a1:
                w.write(*_ENC_MODES["P"])
                a0 = b2
            elif abs(a1 - b1) <= 3:
                d = a1 - b1
                mode = "V0" if d == 0 else f"V{'R' if d > 0 else 'L'}{abs(d)}"
                w.write(*_ENC_MODES[mode])
                a0, color, k = a1, color ^ 1, k + 1
            else:
                a2 = cur[k + 1] if k + 1 < len(cur) else width
                w.write(*_ENC_MODES["H"])
                base = 0 if a0 < 0 else a0
                _write_run(w, a1 - base, color)
                _write_run(w, a2 - a1, color ^ 1)
                a0, k = a2, k + 2
        ref = cur
    w.write(*_ENC_MODES["EOL"])  # EOFB = two EOLs (T.6 §2.2.2)
    w.write(*_ENC_MODES["EOL"])
    return w.done()


def _read_mode(r: _BitReader) -> str:
    for n in _MODE_LENS:
        v = r.peek(n)
        if v is None:
            raise CcittError("truncated G4 stream (mode code)")
        m = _DEC_MODES.get((n, v))
        if m is not None:
            r.skip(n)
            return m
    raise CcittError(f"bad G4 mode code at bit {r.pos}")


def _read_run(r: _BitReader, color: int) -> int:
    total = 0
    dec = _DEC_RUNS[color]
    while True:
        for n in _RUN_LENS:
            v = r.peek(n)
            if v is None:
                raise CcittError("truncated G4 stream (run code)")
            run = dec.get((n, v))
            if run is not None:
                r.skip(n)
                total += run
                if run < 64:  # terminating code ends the run
                    return total
                break
        else:
            raise CcittError(f"bad {'black' if color else 'white'} "
                             f"run code at bit {r.pos}")


def parse_ccitt_g4(data: bytes, columns: int,
                   rows: int | None = None) -> np.ndarray:
    """Pure-G4 bytes -> (h, w) bool ink array (True = black run).

    `columns` is /DecodeParms /Columns (required by the format — line
    width is not self-describing).  `rows` bounds decoding when given
    (/Rows or the image /Height); otherwise lines decode until EOFB or
    the data runs out, matching the filter's EndOfBlock behavior."""
    if columns < 1:
        raise CcittError(f"bad column count {columns}")
    r = _BitReader(data)
    lines: list[list[int]] = []
    ref: list[int] = []
    while rows is None or len(lines) < rows:
        if r.pos >= r.nbits:
            if rows is None:
                break
            raise CcittError(
                f"G4 stream ended after {len(lines)}/{rows} rows")
        cur: list[int] = []
        a0, color = -1, 0
        eofb = False
        while a0 < columns:
            mode = _read_mode(r)
            if mode == "EOL":
                if a0 != -1:
                    raise CcittError("EOL inside a G4 coding line")
                eofb = True
                break
            b1, b2 = _b1b2(ref, a0, color, columns)
            if mode == "P":
                a0 = b2
            elif mode == "H":
                base = 0 if a0 < 0 else a0
                r1 = _read_run(r, color)
                r2 = _read_run(r, color ^ 1)
                cur += [base + r1, base + r1 + r2]
                a0 = base + r1 + r2
            else:  # vertical
                d = int(mode[2]) * (1 if mode[1] == "R" else -1) \
                    if len(mode) == 3 else 0
                a1 = b1 + d
                if a1 <= (cur[-1] if cur else -1) or a1 > columns:
                    raise CcittError(
                        f"non-monotonic changing element {a1}")
                cur.append(a1)
                a0, color = a1, color ^ 1
        if eofb:
            break
        # positions at exactly `columns` are end-of-line markers, not
        # pixel flips; drop them so this line's parity as the next
        # reference line matches the encoder's true-transition view
        ref = [t for t in cur if t < columns]
        lines.append(ref)
    if rows is not None and len(lines) < rows:
        raise CcittError(f"G4 stream ended after {len(lines)}/{rows} rows")
    out = np.zeros((len(lines), columns), dtype=bool)
    for y, chg in enumerate(lines):
        for i in range(0, len(chg) - 1, 2):
            out[y, chg[i]:chg[i + 1]] = True
        if len(chg) % 2:
            out[y, chg[-1]:] = True
    return out


def g4_to_gray(ink: np.ndarray, blackis1: bool = False,
               decode: tuple[float, float] = (0.0, 1.0)) -> np.ndarray:
    """Run colors -> 8-bit gray through the PDF filter semantics:
    /BlackIs1 fixes which decoded BIT a black run becomes (default
    false: black = 0), then the image /Decode array (default [0 1])
    maps bit b to gray Decode[b].  A scanned page with BlackIs1 true
    and no /Decode therefore renders ink WHITE — that is the spec, and
    real producers pair BlackIs1 true with /Decode [1 0]."""
    bit = np.where(np.asarray(ink, dtype=bool),
                   1 if blackis1 else 0, 0 if blackis1 else 1)
    lo, hi = decode
    val = lo + (hi - lo) * bit
    return np.clip(np.rint(val * 255.0), 0, 255).astype(np.uint8)
