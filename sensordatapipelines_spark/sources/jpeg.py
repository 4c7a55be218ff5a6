"""Pure-numpy baseline JPEG (ITU-T T.81) decoder and encoder.

Closes the last named codec in the multimodal "missing" list that is
implementable without external libraries: sequential baseline DCT JPEG —
marker walk, DQT/DHT/SOF0/SOS/DRI parse, byte-stuffed Huffman entropy
decode with DC prediction and restart markers, dequantize + 8×8 IDCT
(matrix form), chroma upsampling for any sampling factors (4:4:4, 4:2:0,
4:2:2, ...), JFIF YCbCr→RGB — **and progressive (SOF2)**: coefficient
accumulation across scans with DC successive approximation, per-band AC
spectral selection with EOBRUN coding, and the AC refinement
correction-bit algorithm (T.81 G.1.2.3), plus a matching progressive
encoder so tests can pin the contract that a progressive stream and the
baseline stream of the same pixels decode bit-identically. Arithmetic
coding, hierarchical (SOF5-7) and 12-bit precision stay a typed
``NotImplementedError``.

JPEG is lossy in general, but a stream whose blocks are CONSTANT is
decoded EXACTLY when the DC quantizer divides the level-shifted DCT DC
term: the staged gate fixtures exploit this (every 8×8 block one md5
byte, quantizer 1) so a DuckDB oracle can strictly value-check a genuine
Huffman+IDCT pipeline. The encoder exists to back round-trip tests and
fixture staging; it writes baseline grayscale or 4:4:4 color with the
T.81 Annex K example Huffman tables.

Decode math notes (mirrored in tests): IDCT is ``A = C^T Q C`` with the
orthonormal DCT-II basis; samples are ``round(a) + 128`` clamped to
[0, 255]. Color conversion is the JFIF/CCIR-601 full-range formula.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index: ZIGZAG[i] = position in the 8×8 block (row-major) of the
# i-th coefficient in transmission order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 example Huffman tables: (bits[1..16], huffval)
_STD_DC_LUM = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_STD_DC_CHROM = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_STD_AC_LUM = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)
_STD_AC_CHROM = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ),
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8×8 DCT-II basis: C[k, n] = s_k cos((2n+1)kπ/16)."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


_DCT_C = _dct_basis()


def _build_huffman(bits, huffval) -> dict[tuple[int, int], int]:
    """T.81 Annex C canonical code construction → {(length, code): symbol}."""
    lut: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lut[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return lut


class _BitReader:
    """Entropy-segment bit reader: MSB-first, 0xFF00 byte-unstuffing,
    stops at any non-RST marker; ``restart()`` consumes an RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                raise ValueError("JPEG entropy stream truncated")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # any marker ends the entropy segment: pad with zero
                    # bits (T.81 fill bits) and leave pos AT the marker —
                    # the multi-scan decoder resumes parsing there and the
                    # caller's unit counts bound how far decode proceeds
                    self.buf = (self.buf << 8) & 0xFFFFFFFF
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        v = (self.buf >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def huffman(self, lut: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.buf = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG restart marker missing")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a ``size``-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """REAL baseline JPEG decode. Returns ``(pixels[h, w, c] uint8,
    width, height, channels)`` — grayscale (1) or RGB (3). Typed-error
    contract: corrupt structures raise ValueError, never a raw
    struct.error/KeyError out of an executor task."""
    try:
        return _decode_jpeg(payload)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, KeyError, IndexError) as exc:
        raise ValueError(f"corrupt JPEG structure: {exc!r}") from exc


def _decode_jpeg(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_lut: dict[int, dict] = {}
    ac_lut: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, o).astype(np.int32)
                    o += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, o).astype(np.int32)
                    o += 128
                z = np.zeros(64, np.int32)
                z[ZIGZAG] = tbl
                qt[tq] = z.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline/extended sequential
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (w, h, comps)
        elif marker == 0xC2:  # SOF2: progressive — own multi-scan path
            return _decode_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X}: only baseline "
                "sequential (SOF0/SOF1) and progressive (SOF2) are "
                "supported"
            )
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = tuple(seg[o + 1 : o + 17])
                nsym = sum(bits)
                huffval = tuple(seg[o + 17 : o + 17 + nsym])
                (dc_lut if tc == 0 else ac_lut)[th] = _build_huffman(bits, huffval)
                o += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                sel.append((cs, tt >> 4, tt & 0x0F))
            scan = (sel, pos + seglen)
            break
        # APPn / COM / others: skip
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = frame
    sel, data_pos = scan
    if len(sel) != len(comps):
        # spec-legal non-interleaved multi-scan baseline (one SOS per
        # component, Ns < Nf): this decoder reads only the FIRST scan as
        # an interleaved pass, which would silently leave the other
        # planes zero (and mis-walk MCU geometry on subsampled frames).
        raise NotImplementedError(
            "non-interleaved multi-scan baseline JPEG (Ns < Nf) is not "
            "supported; re-encode interleaved or use the progressive path"
        )
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in sel:
        c = by_id[cs]
        c["dc"] = dc_lut[td]
        c["ac"] = ac_lut[ta]
        order.append(c)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in comps:
        pw, ph = 8 * c["h"] * mcux, 8 * c["v"] * mcuy
        planes[c["id"]] = np.zeros((ph, pw), np.float64)
        c["pred"] = 0
    rd = _BitReader(payload, data_pos)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            rd.restart()
            for c in order:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in order:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, np.int32)
                    s = rd.huffman(c["dc"])
                    diff = _extend(rd.bits(s), s)
                    c["pred"] += diff
                    coef[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = rd.huffman(c["ac"])
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run overflows block")
                        coef[ZIGZAG[k]] = _extend(rd.bits(s), s)
                        k += 1
                    block = coef.reshape(8, 8) * qt[c["tq"]]
                    px = _DCT_C.T @ block @ _DCT_C
                    px = np.clip(np.round(px) + 128, 0, 255)
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
    return _assemble(planes, comps, hmax, vmax, w, h)


def _assemble(planes, comps, hmax, vmax, w, h):
    """Component pixel planes → upsample + (optional) JFIF color convert."""
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)[:, :, None], w, h, 1
    if len(out_planes) != 3:
        raise NotImplementedError("JPEG with 2 or 4 components unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)
    return rgb, w, h, 3


def _decode_progressive(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Progressive JPEG (SOF2): accumulate quantized coefficients across
    every scan — DC first/refinement (successive approximation of the
    diff-coded DC), AC first (per-band spectral selection with EOBRUN
    coding) and AC refinement (correction-bit algorithm, T.81 G.1.2.3)
    — then dequantize + IDCT once at EOI. Since progressive and
    baseline streams carry the SAME quantized coefficients for the same
    source, both decode bit-identically (the test contract)."""
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_lut: dict[int, dict] = {}
    ac_lut: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker == 0xDB:
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, o).astype(np.int32)
                    o += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, o).astype(np.int32)
                    o += 128
                z = np.zeros(64, np.int32)
                z[ZIGZAG] = tbl
                qt[tq] = z.reshape(8, 8)
        elif marker == 0xC2:
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (w, h, comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                bw, bh = c["h"] * mcux, c["v"] * mcuy
                coefs[c["id"]] = np.zeros((bh, bw, 64), np.int32)
                # ACTUAL (non-MCU-padded) block grid for non-interleaved scans
                c["nbw"] = (-(-(w * c["h"]) // hmax) + 7) // 8
                c["nbh"] = (-(-(h * c["v"]) // vmax) + 7) // 8
        elif marker == 0xC4:
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = tuple(seg[o + 1 : o + 17])
                nsym = sum(bits)
                huffval = tuple(seg[o + 17 : o + 17 + nsym])
                (dc_lut if tc == 0 else ac_lut)[th] = _build_huffman(bits, huffval)
                o += 17 + nsym
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF2")
            w, h, comps = frame
            by_id = {c["id"]: c for c in comps}
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                c = by_id[cs]
                scomps.append((c, tt >> 4, tt & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            rd = _BitReader(payload, pos + seglen)
            _decode_prog_scan(
                rd, scomps, coefs, dc_lut, ac_lut,
                ss, se, ah, al, restart_interval,
                mcux, mcuy, hmax, vmax,
            )
            # the scan's entropy bytes end at the next real marker
            p2 = rd.pos
            while p2 + 1 < len(payload) and not (
                payload[p2] == 0xFF
                and payload[p2 + 1] != 0x00
                and not (0xD0 <= payload[p2 + 1] <= 0xD7)
            ):
                p2 += 1
            pos = p2
            continue
        pos += seglen
    if frame is None:
        raise ValueError("progressive JPEG missing SOF2")
    w, h, comps = frame
    planes = {}
    for c in comps:
        arr = coefs[c["id"]]
        bh, bw = arr.shape[:2]
        q = qt[c["tq"]]
        plane = np.zeros((bh * 8, bw * 8), np.float64)
        # per-block matmul in the SAME operation order as the baseline
        # path, so a pixel landing exactly on a .5 rounding boundary
        # cannot diverge between the two decoders (an einsum over the
        # stack sums in a different order and flips such pixels by 1)
        for by in range(bh):
            for bx in range(bw):
                block = arr[by, bx].reshape(8, 8) * q
                px = _DCT_C.T @ block @ _DCT_C
                plane[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = np.clip(
                    np.round(px) + 128, 0, 255
                )
        planes[c["id"]] = plane
    return _assemble(planes, comps, hmax, vmax, w, h)


def _decode_prog_scan(
    rd, scomps, coefs, dc_lut, ac_lut, ss, se, ah, al,
    restart_interval, mcux, mcuy, hmax, vmax,
):
    """One progressive scan into the coefficient accumulators."""
    if ss == 0 and se != 0:
        raise ValueError(
            "progressive DC scan must have Se=0 (a baseline-coded scan "
            "mislabeled SOF2?)"
        )
    if ss == 0:  # DC scan (interleaved when ns > 1, else the comp's grid)
        for c, td, _ta in scomps:
            c["pred"] = 0
            if ah == 0:
                c["dc"] = dc_lut[td]
        interleaved = len(scomps) > 1
        if interleaved:
            units = mcux * mcuy
        else:
            c0 = scomps[0][0]
            units = c0["nbw"] * c0["nbh"]
        for m in range(units):
            if restart_interval and m and m % restart_interval == 0:
                rd.restart()
                for c, _td, _ta in scomps:
                    c["pred"] = 0
            if interleaved:
                my, mx = divmod(m, mcux)
                for c, _td, _ta in scomps:
                    arr = coefs[c["id"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _dc_unit(rd, c, arr,
                                     my * c["v"] + by, mx * c["h"] + bx,
                                     ah, al)
            else:
                c = scomps[0][0]
                by, bx = divmod(m, c["nbw"])
                _dc_unit(rd, c, coefs[c["id"]], by, bx, ah, al)
        return
    # AC scan: always single-component
    if len(scomps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c, _td, ta = scomps[0]
    arr = coefs[c["id"]]
    ac = ac_lut[ta]
    state = {"eobrun": 0}
    units = c["nbw"] * c["nbh"]
    for m in range(units):
        if restart_interval and m and m % restart_interval == 0:
            rd.restart()
            state["eobrun"] = 0
        by, bx = divmod(m, c["nbw"])
        block = arr[by, bx]
        if ah == 0:
            _ac_first(rd, block, ac, ss, se, al, state)
        else:
            _ac_refine(rd, block, ac, ss, se, al, state)


def _dc_unit(rd, c, arr, by, bx, ah, al):
    if ah == 0:
        s = rd.huffman(c["dc"])
        c["pred"] += _extend(rd.bits(s), s)
        arr[by, bx, 0] = c["pred"] << al
    else:
        arr[by, bx, 0] |= rd.bits(1) << al


def _ac_first(rd, block, ac, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = rd.huffman(ac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += rd.bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC run overflows the spectral band")
        block[ZIGZAG[k]] = _extend(rd.bits(s), s) << al
        k += 1


def _ac_refine(rd, block, ac, ss, se, al, state):
    p1 = 1 << al
    m1 = -1 << al

    def correct(pos):
        if rd.bits(1) and (block[pos] & p1) == 0:
            block[pos] += p1 if block[pos] >= 0 else m1

    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        for k in range(ss, se + 1):
            pos = ZIGZAG[k]
            if block[pos] != 0:
                correct(pos)
        return
    k = ss
    while k <= se:
        rs = rd.huffman(ac)
        r, s = rs >> 4, rs & 0x0F
        val = 0
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += rd.bits(r)
                r = 64  # no new coefficient: just refine to the band end
            # r == 15 (ZRL): skip 16 zero-history positions, refining
        else:
            if s != 1:
                raise ValueError("JPEG AC refinement size must be 1")
            val = p1 if rd.bits(1) else m1
        while k <= se:
            pos = ZIGZAG[k]
            k += 1
            if block[pos] != 0:
                correct(pos)
            else:
                if r == 0:
                    if val:
                        block[pos] = val
                    break
                r -= 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a standalone baseline stream into the TIFF TTN2 pair:
    ``(JPEGTables stream = SOI + DQT/DHT segments + EOI, abbreviated
    stream = SOI + everything else)``. ``_jpeg_tables_merge`` in
    ``sources/geotiff.py`` is the inverse."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    tables = bytearray()
    rest = bytearray()
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("JPEG marker expected while splitting")
        m = stream[pos + 1]
        if m == 0xD9:
            break
        (seglen,) = struct.unpack(">H", stream[pos + 2 : pos + 4])
        if m == 0xDA:  # SOS: entropy data runs to EOI — keep the tail
            rest += stream[pos:]
            return bytes(b"\xff\xd8" + tables + b"\xff\xd9"), bytes(
                b"\xff\xd8" + rest
            )
        seg = stream[pos : pos + 2 + seglen]
        (tables if m in (0xDB, 0xC4) else rest).extend(seg)
        pos += 2 + seglen
    raise ValueError("JPEG stream has no SOS segment")


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def bits(self, v: int, k: int) -> None:
        if k == 0:
            return
        self.buf = (self.buf << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            byte = (self.buf >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self) -> None:
        if self.n:
            self.bits((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill


def _enc_table(bits, huffval) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for the encoder."""
    lut = _build_huffman(bits, huffval)
    return {sym: (code, length) for (length, code), sym in lut.items()}


def _mag_bits(v: int) -> tuple[int, int]:
    """value → (size, magnitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _forward_quantized(
    pixels: np.ndarray, q: np.ndarray
) -> tuple[list[np.ndarray], int, int]:
    """Pixels → per-component quantized coefficient stacks (bh, bw, 64 in
    zigzag order), 4:4:4 / grayscale (the progressive encoder's grid)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc == 3:
        px = pixels.astype(np.float64)
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        chans = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        chans = [pixels[:, :, 0].astype(np.float64)]
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    chans = [np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge") for c in chans]
    out = []
    for c in chans:
        bh, bw = ph // 8, pw // 8
        qc = np.zeros((bh, bw, 64), np.int32)
        # per-block matmuls in encode_jpeg's exact operation order: a
        # coefficient landing on a .5 rounding boundary must quantize
        # identically in both encoders (einsum sums in another order)
        for by in range(bh):
            for bx in range(bw):
                block = c[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] - 128.0
                coef = _DCT_C @ block @ _DCT_C.T
                qc[by, bx] = np.round(coef / q).astype(np.int32).reshape(64)
        out.append(qc[:, :, ZIGZAG])  # store in transmission (zigzag) order
    return out, w, h


def encode_jpeg_progressive(
    pixels: np.ndarray,
    qtable: np.ndarray | None = None,
    dc_al: int = 1,
    ac_al: int = 1,
    bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
) -> bytes:
    """Progressive (SOF2) encoder, 4:4:4 / grayscale: interleaved DC
    first scan at point transform ``dc_al`` + raw-bit DC refinements,
    per-component per-band AC first scans at ``ac_al`` (EOBRUN-coded) +
    AC refinement scans (T.81 G.1.2.3 correction-bit coding with
    buffered bits, the libjpeg-compatible bit order). The quantized
    coefficients are identical to ``encode_jpeg``'s, so both streams
    decode bit-identically — the round-trip contract the tests pin."""
    q = np.ones((8, 8), np.int32) if qtable is None else np.asarray(qtable, np.int32)
    coefs, w, h = _forward_quantized(pixels, q)
    nc = len(coefs)
    out = bytearray(b"\xff\xd8")
    qzz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
    out += _seg(0xDB, bytes([0x00]) + qzz.tobytes())
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    out += _seg(0xC2, sof)
    # progressive AC scans need the EOBn symbols (0x10..0xE0) which the
    # Annex K baseline tables don't define: ship a full 256-symbol AC
    # table as id 2 — 255 codes at 9 bits + 1 at 10 (a DHT count is one
    # byte, so a flat 256×9 is unrepresentable; Kraft 255/512 + 1/1024)
    full_ac = (tuple([0] * 8 + [255, 1] + [0] * 6), tuple(range(256)))
    tables = [(0x00, _STD_DC_LUM), (0x22, full_ac)]
    if nc == 3:
        tables += [(0x01, _STD_DC_CHROM)]
    dht = b""
    for tid, (bits_t, huffval) in tables:
        dht += bytes([tid]) + bytes(bits_t) + bytes(huffval)
    out += _seg(0xC4, dht)
    enc_dc = [_enc_table(*_STD_DC_LUM)] + [_enc_table(*_STD_DC_CHROM)] * 2
    enc_ac = [_enc_table(*full_ac)] * 3

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        hdr = bytes([len(comp_ids)])
        for ci in comp_ids:
            # table byte: DC table id high nibble, AC table id 2 (full)
            hdr += bytes([ci + 1, (0x00 if ci == 0 else 0x10) | 0x02])
        return _seg(0xDA, hdr + bytes([ss, se, (ah << 4) | al]))

    # --- DC first scan: interleaved over all components ---
    out += sos(list(range(nc)), 0, 0, 0, dc_al)
    bw_ = _BitWriter()
    pred = [0] * nc
    bh, bwid = coefs[0].shape[:2]
    for m in range(bh * bwid):
        my, mx = divmod(m, bwid)
        for ci in range(nc):
            v = int(coefs[ci][my, mx, 0]) >> dc_al
            diff = v - pred[ci]
            pred[ci] = v
            size, mag = _mag_bits(diff)
            code, length = enc_dc[ci][size]
            bw_.bits(code, length)
            bw_.bits(mag, size)
    bw_.flush()
    out += bw_.out
    # --- DC refinement scans: one raw bit per block per component ---
    for a in range(dc_al - 1, -1, -1):
        out += sos(list(range(nc)), 0, 0, a + 1, a)
        bw_ = _BitWriter()
        for m in range(bh * bwid):
            my, mx = divmod(m, bwid)
            for ci in range(nc):
                bw_.bits((int(coefs[ci][my, mx, 0]) >> a) & 1, 1)
        bw_.flush()
        out += bw_.out
    # --- AC first scans: per component, per spectral band ---
    for ci in range(nc):
        for ss, se in bands:
            out += sos([ci], ss, se, 0, ac_al)
            out += _ac_first_scan(coefs[ci], enc_ac[ci], ss, se, ac_al)
    # --- AC refinement scans ---
    for a in range(ac_al - 1, -1, -1):
        for ci in range(nc):
            for ss, se in bands:
                out += sos([ci], ss, se, a + 1, a)
                out += _ac_refine_scan(coefs[ci], enc_ac[ci], ss, se, a)
    out += b"\xff\xd9"
    return bytes(out)


def _ac_first_scan(coef, enc_ac, ss, se, al) -> bytes:
    bw_ = _BitWriter()
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            code, length = enc_ac[n << 4]
            bw_.bits(code, length)
            bw_.bits(eobrun - (1 << n), n)
            eobrun = 0

    bh, bwid = coef.shape[:2]
    for m in range(bh * bwid):
        my, mx = divmod(m, bwid)
        zz = coef[my, mx]
        # point-transformed band values (truncation toward zero)
        vals = []
        for k in range(ss, se + 1):
            v = int(zz[k])
            vals.append(-((-v) >> al) if v < 0 else v >> al)
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        last = nz[-1]
        for i, v in enumerate(vals):
            if i > last:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = enc_ac[0xF0]
                bw_.bits(code, length)
                run -= 16
            size, mag = _mag_bits(v)
            code, length = enc_ac[(run << 4) | size]
            bw_.bits(code, length)
            bw_.bits(mag, size)
            run = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    bw_.flush()
    return bytes(bw_.out)


def _ac_refine_scan(coef, enc_ac, ss, se, al) -> bytes:
    bw_ = _BitWriter()
    eobrun = 0
    pending: list[int] = []

    def flush_eob() -> None:
        nonlocal eobrun, pending
        if eobrun:
            n = eobrun.bit_length() - 1
            code, length = enc_ac[n << 4]
            bw_.bits(code, length)
            bw_.bits(eobrun - (1 << n), n)
            for b in pending:
                bw_.bits(b, 1)
            pending = []
            eobrun = 0

    bh, bwid = coef.shape[:2]
    for m in range(bh * bwid):
        my, mx = divmod(m, bwid)
        zz = coef[my, mx]
        # t[k]: magnitude at this approximation level
        ts = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        newly = [i for i, t in enumerate(ts) if t == 1]
        last_new = newly[-1] if newly else -1
        run = 0
        br: list[int] = []

        def emit_zrl() -> None:
            nonlocal run, br
            flush_eob()
            code, length = enc_ac[0xF0]
            bw_.bits(code, length)
            for b in br:
                bw_.bits(b, 1)
            br = []
            run -= 16

        for i, t in enumerate(ts):
            if t == 0:
                run += 1
                continue
            # any nonzero arrival with a pending >15 zero run must emit
            # ZRLs NOW (libjpeg encode_mcu_AC_refine: the buffered
            # correction bits attach to the symbol whose 16-zero advance
            # span covers their positions) — but only while a later
            # newly-significant coefficient still forces more symbols
            while run > 15 and i <= last_new:
                emit_zrl()
            if t > 1:
                br.append(t & 1)  # history-nonzero: correction bit
                continue
            # newly-significant coefficient (t == 1)
            flush_eob()
            code, length = enc_ac[(run << 4) | 1]
            bw_.bits(code, length)
            bw_.bits(1 if int(zz[ss + i]) > 0 else 0, 1)
            for b in br:
                bw_.bits(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    bw_.flush()
    return bytes(bw_.out)


def encode_jpeg(
    pixels: np.ndarray,
    qtable: np.ndarray | None = None,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder: grayscale ([h, w] / [h, w, 1]) or RGB
    ([h, w, 3]) uint8; ``subsample`` "444" or "420" (box-averaged
    chroma); one quantization table for every component (default
    all-ones = numerically lossless DCT path up to coefficient
    rounding); Annex K Huffman tables; optional DRI/RSTn restart
    markers every ``restart_interval`` MCUs."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg takes 1- or 3-channel uint8 pixels")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    sub = subsample == "420" and nc == 3
    q = np.ones((8, 8), np.int32) if qtable is None else np.asarray(qtable, np.int32)
    if nc == 3:
        px = pixels.astype(np.float64)
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        chans = [y, cb, cr]
    else:
        chans = [pixels[:, :, 0].astype(np.float64)]
    # component sampling factors and MCU grid
    mcu_px = 16 if sub else 8
    ph, pw = -(-h // mcu_px) * mcu_px, -(-w // mcu_px) * mcu_px
    chans = [
        np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge") for c in chans
    ]
    if sub:
        for i in (1, 2):
            c = chans[i]
            chans[i] = (
                c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]
            ) / 4.0
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    out = bytearray(b"\xff\xd8")  # SOI
    zz = np.empty(64, np.int32)
    qzz = q.reshape(-1)[ZIGZAG].astype(np.uint8)
    out += _seg(0xDB, bytes([0x00]) + qzz.tobytes())
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], 0])
    out += _seg(0xC0, sof)
    tables = [(0x00, _STD_DC_LUM), (0x10, _STD_AC_LUM)]
    if nc == 3:
        tables += [(0x01, _STD_DC_CHROM), (0x11, _STD_AC_CHROM)]
    dht = b""
    for tid, (bits, huffval) in tables:
        dht += bytes([tid]) + bytes(bits) + bytes(huffval)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    enc_dc = [_enc_table(*_STD_DC_LUM)] + [_enc_table(*_STD_DC_CHROM)] * 2
    enc_ac = [_enc_table(*_STD_AC_LUM)] + [_enc_table(*_STD_AC_CHROM)] * 2
    bw = _BitWriter()
    pred = [0] * nc

    def emit_block(ci: int, block: np.ndarray) -> None:
        coef = _DCT_C @ (block - 128.0) @ _DCT_C.T
        qc = np.round(coef / q).astype(np.int32)
        zz[:] = qc.reshape(-1)[ZIGZAG]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, mag = _mag_bits(diff)
        code, length = enc_dc[ci][size]
        bw.bits(code, length)
        bw.bits(mag, size)
        nz = np.nonzero(zz[1:])[0]
        k = 0
        for idx in nz:
            run = int(idx) - k
            while run > 15:
                c2, l2 = enc_ac[ci][0xF0]
                bw.bits(c2, l2)
                run -= 16
            size, mag = _mag_bits(int(zz[1 + idx]))
            c2, l2 = enc_ac[ci][(run << 4) | size]
            bw.bits(c2, l2)
            bw.bits(mag, size)
            k = int(idx) + 1
        if k < 63:
            c2, l2 = enc_ac[ci][0x00]  # EOB
            bw.bits(c2, l2)

    mcux, mcuy = pw // mcu_px, ph // mcu_px
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out + bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw = _BitWriter()
            for i in range(nc):
                pred[i] = 0
        my, mx = divmod(m, mcux)
        for ci in range(nc):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    emit_block(ci, chans[ci][y0 : y0 + 8, x0 : x0 + 8])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
