"""CCITT Group 3 (T.4 one-dimensional MH) and Group 4 (T.6 MMR) bilevel
codecs — TIFF compressions 2 and 4, pure python.

The fax codecs are the standard compression for scanned/bilevel TIFF
(masks, OCR page images, cadastral rasters). Both directions are
implemented so staged fixtures exercise genuine 2-D mode coding:

- ``g4_decode``/``g4_encode`` — T.6 MMR: vertical (V0, VR1-3, VL1-3),
  pass and horizontal modes against a reference line of changing
  elements, EOFB-terminated.
- ``mh_decode``/``mh_encode`` — T.4 1-D Modified Huffman with each row
  restarting byte-aligned (the TIFF compression-2 framing).

Run-length code tables are the published T.4 tables (terminating codes
0-63 white/black, makeup codes 64-2560; the ≥1792 makeups are shared).
``tests/test_ccitt.py`` asserts the tables are prefix-free per colour
class and pins the canonical entries (white 1728 makeup ``010011011``,
white 0 ``00110101``, black 2 ``11`` …), and every mode path round-trips
under hypothesis.

Pixel convention: decoders return a ``(rows, width)`` uint8 array of
black flags (1 = black); the TIFF layer maps PhotometricInterpretation
(0 = WhiteIsZero ⇒ sample value = black flag; 1 = BlackIsZero ⇒
inverted).
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# T.4 terminating codes: run length -> code string, white then black
_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
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
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# extended makeups ≥ 1792 are colour-independent
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# decode LUTs: {(length, code_int): run}
def _decode_lut(*tables: dict[int, str]) -> dict[tuple[int, int], int]:
    lut: dict[tuple[int, int], int] = {}
    for t in tables:
        for run, code in t.items():
            key = (len(code), int(code, 2))
            if key in lut:
                raise AssertionError(f"duplicate fax code {code}")
            lut[key] = run
    return lut


_WHITE_LUT = _decode_lut(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK_LUT = _decode_lut(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)

_EOL = "000000000001"


class _Bits:
    """MSB-first bit reader over the compressed block."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("CCITT stream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def peek_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("CCITT stream truncated")
        return (self.data[byte] >> (7 - (self.pos & 7))) & 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >= 8 * len(self.data)


def _read_run(bits: _Bits, black: bool) -> int:
    """One complete run: zero or more makeup codes then a terminator."""
    lut = _BLACK_LUT if black else _WHITE_LUT
    total = 0
    while True:
        length = 0
        code = 0
        run = None
        while length < 14:
            code = (code << 1) | bits.read(1)
            length += 1
            run = lut.get((length, code))
            if run is not None:
                break
        if run is None:
            raise ValueError("invalid CCITT run-length code")
        total += run
        if run < 64:  # terminating code ends the run
            return total


class _BitWriterMSB:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write_str(self, code: str) -> None:
        for ch in code:
            self.buf = (self.buf << 1) | (ch == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                self.buf = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write_str("0")

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.n:
            out.append((self.buf << (8 - self.n)) & 0xFF)
        return bytes(out)


def _emit_run(w: _BitWriterMSB, run: int, black: bool) -> None:
    term = _BLACK_TERM if black else _WHITE_TERM
    makeup = _BLACK_MAKEUP if black else _WHITE_MAKEUP
    while run >= 64:
        if run >= 2624:  # largest expressible chunk: 2560 + 63
            w.write_str(_EXT_MAKEUP[2560])
            run -= 2560
            continue
        big = (run // 64) * 64
        if big > 1728:
            w.write_str(_EXT_MAKEUP[big] if big >= 1792 else makeup[1728])
            run -= big if big >= 1792 else 1728
        else:
            w.write_str(makeup[big])
            run -= big
    w.write_str(term[run])


def _row_to_transitions(row: np.ndarray) -> list[int]:
    """Black-flag row → positions where colour changes (starting from
    white), i.e. even entries are W→B, odd are B→W."""
    diff = np.flatnonzero(np.diff(np.concatenate(([0], row.astype(np.int8)))))
    return diff.tolist()


def _transitions_to_row(tr: list[int], width: int) -> np.ndarray:
    row = np.zeros(width, np.uint8)
    for i in range(0, len(tr), 2):
        start = tr[i]
        end = tr[i + 1] if i + 1 < len(tr) else width
        row[start:end] = 1
    return row


def mh_decode(data: bytes, width: int, nrows: int) -> np.ndarray:
    """TIFF compression 2 (T.4 1-D MH, each row byte-aligned, no EOL):
    → black-flag array (nrows, width)."""
    bits = _Bits(data)
    out = np.zeros((nrows, width), np.uint8)
    for y in range(nrows):
        bits.align()
        x = 0
        black = False
        while x < width:
            run = _read_run(bits, black)
            if x + run > width:
                raise ValueError("CCITT MH run overflows the row")
            if black:
                out[y, x : x + run] = 1
            x += run
            black = not black
    return out


def mh_encode(rows: np.ndarray) -> bytes:
    """Inverse of ``mh_decode`` (rows of black flags)."""
    w = _BitWriterMSB()
    width = rows.shape[1]
    for row in rows:
        w.align()
        tr = _row_to_transitions(row) + [width]
        x = 0
        black = False
        for t in tr:
            _emit_run(w, t - x, black)
            x = t
            black = not black
            if x >= width:
                break
    return w.bytes()


def g4_decode(data: bytes, width: int, nrows: int) -> np.ndarray:
    """TIFF compression 4 (T.6 MMR) → black-flag array (nrows, width)."""
    bits = _Bits(data)
    out = np.zeros((nrows, width), np.uint8)
    ref = [width, width]  # imaginary all-white line above the first row
    for y in range(nrows):
        cur: list[int] = []
        a0 = -1
        color = 0  # 0 = white
        while a0 < width:
            # b1: first changing element of ref right of a0 whose parity
            # matches the current colour (even = W→B, odd = B→W)
            i = bisect_right(ref, a0)
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else width
            b2 = ref[i + 1] if i + 1 < len(ref) else width
            # mode decode
            if bits.read(1):  # 1 → V0
                a1 = b1
                cur.append(a1)
                a0, color = a1, color ^ 1
                continue
            if bits.read(1):  # 01x → VR1 / VL1
                a1 = b1 + 1 if bits.read(1) else b1 - 1
                if a1 < 0:
                    raise ValueError("CCITT G4 negative changing element")
                cur.append(a1)
                a0, color = a1, color ^ 1
                continue
            if bits.read(1):  # 001 → horizontal: two MH runs
                start = a0 if a0 > 0 else 0
                r1 = _read_run(bits, bool(color))
                r2 = _read_run(bits, not color)
                cur.append(start + r1)
                cur.append(start + r1 + r2)
                a0 = start + r1 + r2
                continue
            if bits.read(1):  # 0001 → pass
                a0 = b2
                continue
            # 0000 1x / 0000 01x / longer: VR2 VL2 VR3 VL3 or EOFB
            if bits.read(1):  # 00001x → VR2/VL2
                a1 = b1 + 2 if bits.read(1) else b1 - 2
            elif bits.read(1):  # 000001x → VR3/VL3
                a1 = b1 + 3 if bits.read(1) else b1 - 3
            else:
                # 0000000...: EOL/EOFB inside G4 means end of data
                return out
            if a1 < 0:
                # corrupt stream: a vertical-mode delta near the left edge
                # produced a negative position — Python slicing would wrap
                # it silently into wrong pixels (typed-error contract)
                raise ValueError("CCITT G4 negative changing element")
            cur.append(a1)
            a0, color = a1, color ^ 1
        if cur and cur[-1] > width:
            raise ValueError("CCITT G4 changing element beyond row width")
        tr = [t for t in cur if t < width]
        out[y] = _transitions_to_row(tr, width)
        ref = tr + [width, width]
    return out


def g4_encode(rows: np.ndarray) -> bytes:
    """T.6 MMR encoder (vertical/pass/horizontal mode selection per the
    flowchart in T.6 §2.2), EOFB-terminated."""
    w = _BitWriterMSB()
    width = rows.shape[1]
    ref = [width, width]
    for row in rows:
        tr = _row_to_transitions(row)
        cur = tr + [width, width]
        a0 = -1
        color = 0
        ci = 0  # index into cur of a1
        while a0 < width:
            a1 = cur[ci] if ci < len(cur) else width
            i = bisect_right(ref, a0)
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else width
            b2 = ref[i + 1] if i + 1 < len(ref) else width
            if b2 < a1:
                w.write_str("0001")  # pass
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                w.write_str(
                    {0: "1", 1: "011", 2: "000011", 3: "0000011",
                     -1: "010", -2: "000010", -3: "0000010"}[d]
                )
                a0, color = a1, color ^ 1
                ci += 1
                continue
            # horizontal
            a2 = cur[ci + 1] if ci + 1 < len(cur) else width
            start = a0 if a0 > 0 else 0
            w.write_str("001")
            _emit_run(w, a1 - start, bool(color))
            _emit_run(w, a2 - a1, not color)
            a0 = a2
            ci += 2
        ref = tr + [width, width]
    w.write_str(_EOL + _EOL)  # EOFB
    return w.bytes()
