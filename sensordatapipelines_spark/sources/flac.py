"""Pure-python FLAC decoder/encoder (the free-lossless-audio-codec
format, public spec at xiph.org / RFC 9639).

FLAC is LOSSLESS, so unlike the perceptual codecs it belongs on the
real-decode side of the boundary: decoded samples are bit-exact and a
staged fixture is strictly value-oracle-able. Scope:

- **Decoder**: STREAMINFO + metadata-block walk, frame sync with CRC-8
  header / CRC-16 frame checks, UTF-8-coded frame numbers, all four
  subframe types — CONSTANT, VERBATIM, FIXED orders 0-4 and LPC (any
  order, precision/shift reconstruction) — Rice/Rice2 residuals with
  partition orders and escape codes, wasted-bits, and the
  left/side–right/side–mid/side stereo decorrelations.
- **Encoder** (fixture/round-trip side): 8/16-bit, 1-2 channels
  (independent), per-block best FIXED order 0-2 by residual magnitude,
  single-partition Rice residuals with a mean-based parameter, correct
  CRC-8/CRC-16 (test-vector pinned: 0xF4 / 0xFEE8 over "123456789").

Typed-error contract like every repo codec: corrupt payloads raise
``ValueError``, never a raw struct/IndexError from an executor task.
"""

from __future__ import annotations

import struct

import numpy as np

_CRC8_TBL = None
_CRC16_TBL = None


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (the FLAC frame-header CRC)."""
    global _CRC8_TBL
    if _CRC8_TBL is None:
        tbl = []
        for b in range(256):
            r = b
            for _ in range(8):
                r = ((r << 1) ^ 0x07 if r & 0x80 else r << 1) & 0xFF
            tbl.append(r)
        _CRC8_TBL = tbl
    crc = 0
    for b in data:
        crc = _CRC8_TBL[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0, unreflected (the FLAC frame CRC)."""
    global _CRC16_TBL
    if _CRC16_TBL is None:
        tbl = []
        for b in range(256):
            r = b << 8
            for _ in range(8):
                r = ((r << 1) ^ 0x8005 if r & 0x8000 else r << 1) & 0xFFFF
            tbl.append(r)
        _CRC16_TBL = tbl
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TBL[((crc >> 8) ^ b) & 0xFF]
    return crc


class _Bits:
    """MSB-first bit reader over the frame bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        p = self.bitpos
        if (p + n) > 8 * len(d):
            raise ValueError("FLAC stream truncated")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.bitpos = p
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        d = self.data
        p = self.bitpos
        limit = 8 * len(d)
        q = 0
        while True:
            if p >= limit:
                raise ValueError("FLAC stream truncated in unary code")
            if (d[p >> 3] >> (7 - (p & 7))) & 1:
                p += 1
                break
            q += 1
            p += 1
        self.bitpos = p
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def bytepos(self) -> int:
        return self.bitpos >> 3


_BLOCKSIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(bits: _Bits) -> int:
    """FLAC's UTF-8-style frame/sample number (up to 7 bytes)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("FLAC frame number coding invalid")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC frame number continuation invalid")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("FLAC residual coding method reserved")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = bits.read(4)
    nparts = 1 << po
    out: list[int] = []
    for p in range(nparts):
        cnt = (blocksize >> po) - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            for _ in range(cnt):
                out.append(bits.sread(raw) if raw else 0)
        else:
            for _ in range(cnt):
                q = bits.unary()
                r = bits.read(param) if param else 0
                zz = (q << param) | r
                out.append((zz >> 1) ^ -(zz & 1))  # unzigzag
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits-per-sample flag: unary k-1
        wasted = bits.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = bits.sread(bps)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [bits.sread(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        samples = [bits.sread(bps) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 0x1F) + 1
        samples = [bits.sread(bps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("FLAC LPC precision code 15 is invalid")
        shift = bits.sread(5)
        if shift < 0:
            raise ValueError("FLAC negative LPC shift")
        coefs = [bits.sread(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + (pred >> shift))
    else:
        raise ValueError(f"FLAC subframe type {stype} reserved")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """REAL FLAC decode → ``(frames[n, channels] int32, sample_rate,
    channels, bits_per_sample)`` — the ``decode_wav`` tuple shape with
    bps in the block-align slot's place."""
    try:
        return _decode_flac(payload)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError) as exc:
        raise ValueError(f"corrupt FLAC structure: {exc!r}") from exc


def _decode_flac(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (bad magic)")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if blen < 34:
                raise ValueError("FLAC STREAMINFO truncated")
            bits = _Bits(body)
            bits.read(16)  # min blocksize
            bits.read(16)  # max blocksize
            bits.read(24)  # min frame size
            bits.read(24)  # max frame size
            rate = bits.read(20)
            channels = bits.read(3) + 1
            bps = bits.read(5) + 1
            total = bits.read(36)
            streaminfo = (rate, channels, bps, total)
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, channels, bps, total = streaminfo
    chans: list[list[int]] = [[] for _ in range(channels)]
    while pos + 2 <= len(payload):
        frame_start = pos
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        rate_code = bits.read(4)
        chan_code = bits.read(4)
        size_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("FLAC blocksize code 0 reserved")
        if bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZES[bs_code]
        if rate_code == 12:
            bits.read(8)
        elif rate_code in (13, 14):
            bits.read(16)
        elif rate_code == 15:
            raise ValueError("FLAC sample rate code 15 invalid")
        hdr_end = bits.bytepos()
        crc8 = bits.read(8)
        if _crc8(payload[frame_start:hdr_end]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        if size_code == 3:
            raise ValueError("FLAC sample size code 3 reserved")
        frame_bps = _SAMPLE_SIZES.get(size_code, bps)  # 0 → STREAMINFO
        if chan_code <= 7:
            n_ch = chan_code + 1
            subs = [
                _decode_subframe(bits, blocksize, frame_bps)
                for _ in range(n_ch)
            ]
        elif chan_code in (8, 9, 10):
            n_ch = 2
            # the SIDE channel carries one extra bit
            if chan_code == 8:  # left/side
                left = _decode_subframe(bits, blocksize, frame_bps)
                side = _decode_subframe(bits, blocksize, frame_bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(bits, blocksize, frame_bps + 1)
                right = _decode_subframe(bits, blocksize, frame_bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(bits, blocksize, frame_bps)
                side = _decode_subframe(bits, blocksize, frame_bps + 1)
                lr = []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    lr.append(((m2 + s) >> 1, (m2 - s) >> 1))
                subs = [[p[0] for p in lr], [p[1] for p in lr]]
        else:
            raise ValueError(f"FLAC channel assignment {chan_code} reserved")
        if n_ch != channels:
            raise ValueError("FLAC frame channel count differs from STREAMINFO")
        bits.align()
        crc_end = bits.bytepos()
        crc16 = bits.read(16)
        if _crc16(payload[frame_start:crc_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(subs[c])
        pos = bits.bytepos()
        if total and len(chans[0]) >= total:
            break
    n = min(len(c) for c in chans)
    if total:
        n = min(n, total)
    out = np.empty((n, channels), np.int32)
    for c in range(channels):
        out[:, c] = chans[c][:n]
    return out, rate, channels, bps


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.buf = (self.buf << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.buf >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    n = 1
    while v >= (1 << (6 * n + (6 - n))):
        n += 1
    # n continuation bytes
    for _ in range(n):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_mask = (0xFF << (7 - n)) & 0xFF
    out.append(lead_mask | v)
    return bytes(reversed(out))


def _best_fixed_order(x: np.ndarray) -> int:
    best, best_cost = 0, None
    d = x.astype(np.int64)
    for order in range(3):
        if len(d) <= order:
            break
        cost = np.abs(d).sum()
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
        d = np.diff(d)
    return best


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 4096,
) -> bytes:
    """FLAC encoder: ``samples`` [n] or [n, channels] int, independent
    channels, per-block best FIXED order 0-2, single-partition Rice."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if samples.min(initial=0) < lo or samples.max(initial=0) > hi:
        raise ValueError(f"samples exceed {bps}-bit range")
    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = bytes(si.out) + bytes(16)  # md5 unset (all zero = not computed)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    size_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start : start + block_size]
        bsz = blk.shape[0]
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # blocksize: 16-bit field follows
        w.write(0, 4)  # sample rate: in STREAMINFO
        w.write(channels - 1, 4)  # independent channels
        w.write(size_code, 3)
        w.write(0, 1)
        for b in _utf8_number(frame_no):
            w.write(b, 8)
        w.write(bsz - 1, 16)
        hdr = bytes(w.out)
        assert w.n == 0
        w.write(_crc8(hdr), 8)
        for c in range(channels):
            x = blk[:, c].astype(np.int64)
            order = _best_fixed_order(x)
            w.write(0, 1)
            w.write(8 + order, 6)  # FIXED subframe
            w.write(0, 1)  # no wasted bits
            for k in range(order):
                w.write(int(x[k]), bps)
            resid = x.copy()
            for _ in range(order):
                resid = np.diff(resid)
            # single partition, Rice parameter from the mean magnitude
            mean = float(np.abs(resid).mean()) if resid.size else 0.0
            param = 0
            while (1 << param) < mean + 1 and param < 14:
                param += 1
            w.write(0, 2)  # rice method 0 (4-bit params)
            w.write(0, 4)  # partition order 0
            w.write(param, 4)
            for r in resid:
                r = int(r)
                zz = (r << 1) ^ (r >> 63)  # zigzag (arith shift sign)
                w.unary(zz >> param)
                if param:
                    w.write(zz & ((1 << param) - 1), param)
        w.align()
        frame = bytes(w.out)
        w.write(_crc16(frame), 16)
        out += bytes(w.out)
        frame_no += 1
    return bytes(out)
