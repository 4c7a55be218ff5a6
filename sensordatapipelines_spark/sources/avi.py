"""Minimal MJPEG AVI container: parse and write, pure python.

Motion-JPEG is the one *video* format a stdlib-only executor can decode
for real: the AVI RIFF container indexes per-frame baseline JPEG
streams, and ``sources/jpeg.py`` decodes those. This retires "video
frame extraction requires ffmpeg" for the MJPEG profile — inter-frame
codecs (H.264/VP9/AV1) genuinely need a motion-compensation stack and
stay a typed boundary.

Layout handled (the classic single-video-stream file every MJPEG tool
emits)::

    RIFF('AVI '
         LIST('hdrl' avih(<MainAVIHeader>)
              LIST('strl' strh(<AVIStreamHeader fccType='vids'
                                fccHandler='MJPG'>)
                          strf(<BITMAPINFOHEADER biCompression='MJPG'>)))
         LIST('movi' '00dc' <JPEG> '00dc' <JPEG> ...)
         idx1(<index>))

``parse_avi_mjpeg`` walks the RIFF tree tolerantly (skips unknown
chunks, accepts '00db' uncompressed-flagged frames that still hold JPEG
bytes, ignores a missing idx1) and returns the frame streams plus
header facts; ``write_avi_mjpeg`` emits the layout above with a correct
idx1 so strict players accept staged fixtures.
"""

from __future__ import annotations

import struct


def _fourcc(b: bytes) -> bytes:
    return b.ljust(4)[:4]


def parse_avi_mjpeg(payload: bytes) -> tuple[list[bytes], dict]:
    """AVI payload → ``(frames, meta)`` where ``frames`` is the ordered
    list of per-frame JPEG streams from the video stream's '00dc'/'00db'
    chunks and ``meta`` carries ``width height n_frames usec_per_frame``
    from the main header. Raises ``ValueError`` on non-AVI payloads or a
    missing movi list."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (bad RIFF form)")
    meta = {"width": None, "height": None, "n_frames": None,
            "usec_per_frame": None}
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (csize,) = struct.unpack_from("<I", payload, pos + 4)
            body_at = pos + 8
            if body_at + csize > len(payload):
                raise ValueError("AVI chunk overruns the payload")
            if cid == b"LIST":
                # list type + children
                walk(body_at + 4, body_at + csize)
            elif cid == b"avih":
                (
                    meta["usec_per_frame"], _mbps, _pad, _flags,
                    meta["n_frames"],
                ) = struct.unpack_from("<IIIII", payload, body_at)
                meta["width"], meta["height"] = struct.unpack_from(
                    "<II", payload, body_at + 32
                )
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(payload[body_at : body_at + csize])
            pos = body_at + csize + (csize & 1)

    # the outer RIFF body starts after the 12-byte RIFF/size/form header
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    walk(12, min(8 + riff_size, len(payload)))
    if not frames:
        raise ValueError("AVI has no video frame chunks (movi missing?)")
    return frames, meta


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return _fourcc(cid) + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", _fourcc(ltype) + body)


def write_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Single-video-stream MJPEG AVI with a correct idx1 index."""
    if not frames:
        raise ValueError("write_avi_mjpeg needs at least one frame")
    maxbuf = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxbuf * fps,      # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        len(frames), 0, 1, maxbuf,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI4H",
                      0, 0, 0, 0,      # flags, priority, language, initial
                      1, fps,          # dwScale / dwRate
                      0, len(frames), maxbuf,
                      -1, 0,           # dwQuality (-1 = default), sample size
                      0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    offsets = []
    for f in frames:
        offsets.append(4 + len(movi_body))  # offset from 'movi' fourcc
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)
    idx = b""
    for f, off in zip(frames, offsets):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
    body = hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
