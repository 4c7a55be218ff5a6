"""Uncompressed GeoTIFF ingestion/export without a raster library.

The reference's raster surface is ``rasterio.open`` consuming grid files
(``/root/reference/src/data_preprocessing.py:471,515-538``). The engine's
raster model is the exploded cell table ``(band, px, py, x, y, value,
nodata, grid_file)`` (SURVEY §1.2); ``open_ascii_grid`` covers the text
grid format, and this module covers the binary one GIS tools actually
exchange: GeoTIFF — classic TIFF 6.0 with the GeoTIFF georeferencing
tags. Scope covers the profiles GDAL actually writes: Compression =
NONE / DEFLATE (8 + legacy 32946, stdlib ``zlib``) / LZW (pure-Python
TIFF-variant decoder with the early code-width change) / PackBits /
new-style JPEG (7: per-strip T.81 baseline streams with the TTN2
shared-``JPEGTables`` splice, decoded by ``sources/jpeg.py``) /
CCITT Group 4 and Group 3-1D fax (4 and 2: T.6 MMR / T.4 MH bilevel,
``sources/ccitt.py``, WhiteIsZero-aware), with
the horizontal Predictor (tag 317 = 2) undone as a vectorized modular
cumsum; both byte orders, strip- and tile-organized layouts, chunky
(PlanarConfiguration=1) multi-sample files, 8/16/32-bit integer
(signed/unsigned) and 32/64-bit float samples, ``ModelPixelScaleTag`` +
``ModelTiepointTag`` georeferencing, and the GDAL ``GDAL_NODATA`` ASCII
tag. The remaining exotic codecs (Zstd, WebP, JPEG2000) raise a
typed error naming the compression rather than silently mis-decoding.

- ``parse_geotiff`` — payload → ``(array (bands, nrows, ncols) float64,
  meta)`` with ``meta = {ncols, nrows, n_bands, sx, sy, ulx, uly,
  nodata}``. Pure struct/numpy; runs on executors.
- ``open_geotiff`` — Spark entry via the built-in ``binaryFile`` source
  (one row per file, file-parallel — the tiles-as-files layout big
  rasters ship as) + an Arrow ``mapInPandas`` kernel emitting the cell
  table. Cell coords follow ``open_ascii_grid``'s conventions exactly
  (``py`` grows upward, ``origin='corner'`` ⇒ ``x = xll + px·sx``,
  ``y = yll + py·sy`` with ``yll = uly − nrows·sy``), so oracles written
  against the synthetic cell table transfer bit-exactly.
- ``write_geotiff`` — minimal single/multi-sample uncompressed writer
  (one strip per row, little-endian) for staging and export parity;
  driver-side, same small-layer contract as the GeoJSON/Shapefile sinks.

Scale note: ONE file decodes in one task (uncompressed TIFF strips are
seekable, but binaryFile delivers whole payloads); the normal large-
raster layout is a directory of tiles-as-files, which parallelizes at
listing time. A monolithic raster too big for one task should be
converted once to cell-table parquet and consumed from there.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# TIFF field types -> (struct fmt char, size)
_TYPE_FMT = {
    1: ("B", 1),  # BYTE
    2: ("c", 1),  # ASCII
    3: ("H", 2),  # SHORT
    4: ("I", 4),  # LONG
    6: ("b", 1),  # SBYTE
    7: ("B", 1),  # UNDEFINED (opaque bytes, e.g. JPEGTables)
    8: ("h", 2),  # SSHORT
    9: ("i", 4),  # SLONG
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
}

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 33550  # ModelPixelScaleTag: (sx, sy, sz) doubles
_TAG_TIEPOINT = 33922  # ModelTiepointTag: (i, j, k, x, y, z) ...
_TAG_GDAL_NODATA = 42113  # ASCII

_COMPRESSION_NAMES = {
    2: "CCITT-RLE", 5: "LZW", 6: "old-JPEG", 7: "JPEG",
    8: "Deflate", 32773: "PackBits", 32946: "Deflate(legacy)",
    34712: "JPEG2000", 50000: "Zstd", 50001: "WebP",
}

# decodable compression schemes: 1=None, 5=LZW, 8/32946=Deflate,
# 32773=PackBits — the profiles GDAL's default COMPRESS= options emit —
# plus 7=JPEG (new-style T.81 baseline per strip/tile, TTN2), decoded by
# the repo's own sources/jpeg.py
_COMP_NONE, _COMP_LZW, _COMP_DEFLATE, _COMP_DEFLATE_OLD, _COMP_PACKBITS = (
    1, 5, 8, 32946, 32773,
)
_COMP_JPEG = 7
_COMP_CCITT_MH, _COMP_CCITT_G3, _COMP_CCITT_G4 = 2, 3, 4
_DECODABLE = {_COMP_NONE, _COMP_LZW, _COMP_DEFLATE, _COMP_DEFLATE_OLD,
              _COMP_PACKBITS, _COMP_JPEG, _COMP_CCITT_MH, _COMP_CCITT_G4}
_TAG_JPEG_TABLES = 347
_TAG_PHOTOMETRIC = 262
_TAG_T6_OPTIONS = 293


def _jpeg_tables_merge(tables: bytes | None, strip: bytes) -> bytes:
    """TIFF TTN2: a strip may be an ABBREVIATED JPEG stream whose
    DQT/DHT live once in the JPEGTables tag (an SOI…EOI wrapper);
    splice them after the strip's SOI to form a standalone stream."""
    if strip[:2] != b"\xff\xd8":
        raise ValueError("TIFF-JPEG strip missing SOI")
    if tables is not None and len(tables) > 4:
        if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
            raise ValueError("JPEGTables tag is not an SOI…EOI stream")
        return b"\xff\xd8" + tables[2:-2] + strip[2:]
    return strip

_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, codes grow
    9→12 bits with the EARLY code-width change (width bumps when the next
    free code reaches 2^width − 1, one code before the table is actually
    full — the quirk that distinguishes TIFF LZW from GIF LZW)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, next_code = 9, 258
    bitbuf = nbits = 0
    prev: bytes | None = None
    i, n = 0, len(data)
    while True:
        while nbits < width:
            if i >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[i]
            i += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_EOI:
            return bytes(out)
        if code == _LZW_CLEAR:
            del table[258:]
            width, next_code, prev = 9, 258, None
            continue
        if prev is None:
            if code > 255:
                raise ValueError("corrupt LZW stream: first code not literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
            table.append(prev + entry[:1])
            next_code += 1
        elif code == next_code:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
            next_code += 1
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        if next_code == (1 << width) - 1 and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (writer + round-trip tests); mirrors
    ``_lzw_decode``'s early-change width schedule exactly."""
    out = bytearray()
    bitbuf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    width, next_code = 9, 258
    emit(_LZW_CLEAR, width)
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # the encoder sits one table entry AHEAD of the decoder, so its
        # width bump fires one entry later than the decoder's early-change
        # check (verified against the JDK ImageIO TIFF codec both ways)
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4094:  # table nearly full: clear, like libtiff
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            width, next_code = 9, 258
        w = c
    if w:
        emit(table[w], width)
        # the decoder appends one more table entry when it consumes this
        # final data code, and ITS early-change check fires before it
        # reads the next code — if that lands exactly on the boundary
        # (e.g. 766 data codes -> decoder next_code 1023 at width 10),
        # EOI must be written at the bumped width or strict readers
        # misparse the tail.  At this point the encoder's next_code
        # equals the decoder's (the flush registers no entry).
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_LZW_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            if i >= n:
                raise ValueError("corrupt PackBits stream: truncated run")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """PackBits packer: byte runs become (257−n, byte) pairs, everything
    else literal spans; inverse of ``_packbits_decode``."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while j < n and j - i < 128 and not (
                j + 2 < n and data[j] == data[j + 1] == data[j + 2]
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


def _inflate_block(raw: bytes, comp: int) -> bytes:
    if comp == _COMP_NONE:
        return raw
    if comp in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
        return zlib.decompress(raw)
    if comp == _COMP_LZW:
        return _lzw_decode(raw)
    if comp == _COMP_PACKBITS:
        return _packbits_decode(raw)
    raise ValueError(
        f"compressed GeoTIFF ({_COMPRESSION_NAMES.get(comp, str(comp))}) "
        "not supported: re-export as NONE/DEFLATE/LZW/PACKBITS/"
        "JPEG/CCITT-G4"
    )


def _undo_predictor(block: bytes, rows: int, ncols: int, spp: int,
                    dt: np.dtype) -> bytes:
    """Undo horizontal differencing (Predictor=2): within each row, each
    sample stores the delta vs the same sample one pixel left; the
    inverse is a modular cumulative sum per (row, sample) lane at the
    native integer width (int64 cumsum then truncating cast == the
    spec's modulo-2^bits addition)."""
    arr = np.frombuffer(block, dtype=dt).reshape(rows, ncols, spp)
    undone = np.cumsum(arr.astype(np.int64), axis=1).astype(dt)
    return undone.tobytes()


def _undo_fp_predictor(block: bytes, rows: int, ncols: int, spp: int,
                       dt: np.dtype) -> np.ndarray:
    """Undo the floating-point predictor (tag 317 = 3, TIFF Technical
    Note 3, the GDAL ``PREDICTOR=3`` float32/64 DEM profile): each row
    stores its values byte-DEINTERLEAVED into per-significance planes
    (plane 0 = most-significant byte of every value, MSB-first regardless
    of file byte order — libtiff ``tif_predict.c`` convention) with
    byte-wise horizontal differencing on top. The inverse is a modular
    byte cumsum across the whole row, then plane re-interleave and a
    big-endian reinterpret. Returns the decoded ``(rows, ncols·spp)``
    array directly (native float)."""
    wc = ncols * spp
    bps = dt.itemsize
    b = np.frombuffer(block, dtype=np.uint8).reshape(rows, wc * bps)
    acc = np.cumsum(b.astype(np.int64), axis=1).astype(np.uint8)
    planes = acc.reshape(rows, bps, wc)
    be = np.ascontiguousarray(planes.transpose(0, 2, 1))
    out = np.frombuffer(
        be.tobytes(), dtype=np.dtype(">" + dt.kind + str(bps))
    ).reshape(rows, wc)
    return out


def _apply_fp_predictor(data: np.ndarray) -> np.ndarray:
    """Forward floating-point predictor for the writer: ``data`` is the
    chunky ``(nrows, ncols, spp)`` native-float cube; returns the
    ``(nrows, row_bytes)`` uint8 rows ready for per-strip compression
    (inverse of ``_undo_fp_predictor``)."""
    nrows, ncols, spp = data.shape
    wc = ncols * spp
    bps = data.dtype.itemsize
    be = np.ascontiguousarray(data.astype(data.dtype.newbyteorder(">")))
    rowb = np.frombuffer(be.tobytes(), dtype=np.uint8).reshape(nrows, wc, bps)
    planes = np.ascontiguousarray(rowb.transpose(0, 2, 1)).reshape(
        nrows, wc * bps
    )
    wide = planes.astype(np.int16)
    wide[:, 1:] -= wide[:, :-1].copy()
    return wide.astype(np.uint8)


def _read_ifd(payload: bytes, bo: str, off: int) -> dict[int, list]:
    """One IFD → ``{tag: [values...]}`` with out-of-line values followed."""
    (n,) = struct.unpack_from(bo + "H", payload, off)
    entries: dict[int, list] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, ftype, count = struct.unpack_from(bo + "HHI", payload, base)
        if ftype not in _TYPE_FMT:
            continue
        fmt, sz = _TYPE_FMT[ftype]
        total = sz * count
        if total <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", payload, base + 8)
        if ftype == 2:  # ASCII: NUL-terminated string
            raw = payload[voff : voff + count]
            entries[tag] = [raw.split(b"\x00")[0].decode("ascii", "replace")]
        else:
            entries[tag] = list(
                struct.unpack_from(bo + str(count) + fmt, payload, voff)
            )
    return entries


def _sample_dtype(bits: int, sfmt: int, bo: str) -> np.dtype:
    end = "<" if bo == "<" else ">"
    if sfmt == 3:  # IEEE float
        if bits == 32:
            return np.dtype(end + "f4")
        if bits == 64:
            return np.dtype(end + "f8")
        raise ValueError(f"unsupported float sample width: {bits} bits")
    kind = "i" if sfmt == 2 else "u"
    if bits in (8, 16, 32):
        return np.dtype(f"{end}{kind}{bits // 8}")
    raise ValueError(f"unsupported integer sample width: {bits} bits")


def parse_geotiff(payload: bytes) -> tuple[np.ndarray, dict]:
    """Parse an uncompressed classic GeoTIFF → ``(cube, meta)`` where
    ``cube`` is ``(n_bands, nrows, ncols) float64`` (row 0 = TOP row, the
    TIFF raster order) and ``meta`` carries ``ncols nrows n_bands sx sy
    ulx uly nodata``. Raises ``ValueError`` on BigTIFF, compressed
    profiles (naming the compression), planar (non-chunky) layout, and
    ANY truncated/corrupt structure — executor tasks see one typed error
    class, never a raw ``struct.error``/``KeyError`` from a bad file."""
    try:
        return _parse_geotiff(payload)
    except (ValueError, NotImplementedError):
        raise
    except (struct.error, KeyError, IndexError) as exc:
        raise ValueError(f"corrupt GeoTIFF structure: {exc!r}") from exc


def _parse_geotiff(payload: bytes) -> tuple[np.ndarray, dict]:
    if len(payload) < 8:
        raise ValueError("not a TIFF: truncated header")
    order = payload[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack_from(bo + "H", payload, 2)
    if magic == 43:
        raise ValueError("BigTIFF not supported: re-export as classic TIFF")
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    tags = _read_ifd(payload, bo, ifd_off)

    comp = int(tags.get(_TAG_COMPRESSION, [1])[0])
    if comp not in _DECODABLE:
        name = _COMPRESSION_NAMES.get(comp, str(comp))
        raise ValueError(
            f"compressed GeoTIFF ({name}) not supported: "
            "re-export as NONE/DEFLATE/LZW/PACKBITS/JPEG/CCITT-G4"
        )
    if int(tags.get(_TAG_PLANAR, [1])[0]) != 1:
        raise ValueError("planar (PlanarConfiguration=2) TIFF not supported")
    predictor = int(tags.get(_TAG_PREDICTOR, [1])[0])
    if predictor not in (1, 2, 3):
        raise ValueError(
            f"TIFF predictor {predictor} not supported "
            "(none/horizontal/floating-point)"
        )

    ncols = int(tags[_TAG_WIDTH][0])
    nrows = int(tags[_TAG_HEIGHT][0])
    spp = int(tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0])
    bits_l = tags.get(_TAG_BITS, [8])
    if len(set(bits_l)) > 1:
        raise ValueError("mixed per-sample bit depths not supported")
    bits = int(bits_l[0])
    sfmt_l = tags.get(_TAG_SAMPLE_FORMAT, [1])
    sfmt = int(sfmt_l[0])
    # bilevel fax strips decode straight to 0/1 samples — no byte dtype
    dt = (
        np.dtype("u1")
        if comp in (_COMP_CCITT_MH, _COMP_CCITT_G4) and bits == 1
        else _sample_dtype(bits, sfmt, bo)
    )

    # an UNCOMPRESSED raster's sample bytes cannot exceed the file that
    # holds them — a header claiming otherwise is corrupt, and allocating
    # its canvas would OOM the executor before any strip read could fail
    if ncols <= 0 or nrows <= 0 or spp <= 0:
        raise ValueError("corrupt GeoTIFF: non-positive raster dimensions")
    canvas_bytes = nrows * ncols * spp * (bits // 8)
    if comp == _COMP_NONE and canvas_bytes > 2 * len(payload) + 4096:
        raise ValueError(
            "corrupt GeoTIFF: declared dimensions exceed the payload size"
        )
    # compressed profiles can legitimately shrink far below the canvas;
    # bound the canvas absolutely instead so a corrupt header cannot OOM
    # the executor (512 MB ≈ an 8k×8k 8-band float64 tile — a raster that
    # should be a directory of tiles, not one task's file, per the module
    # scale note)
    if canvas_bytes > 512 << 20:
        raise ValueError(
            "GeoTIFF canvas exceeds the 512 MB single-task bound: "
            "split the raster into tiles-as-files"
        )

    if predictor == 2 and dt.kind == "f":
        raise ValueError(
            "horizontal predictor on float samples not supported "
            "(use Predictor=1 or the floating-point Predictor=3)"
        )
    if predictor == 3 and dt.kind != "f":
        raise ValueError(
            "floating-point predictor (3) requires IEEE float samples"
        )
    jpeg_tables: bytes | None = None
    if comp == _COMP_JPEG:
        if bits != 8 or sfmt != 1:
            raise ValueError("TIFF-JPEG strips are 8-bit unsigned only")
        if predictor != 1:
            raise ValueError("TIFF-JPEG does not combine with a predictor")
        if _TAG_JPEG_TABLES in tags:
            jpeg_tables = bytes(tags[_TAG_JPEG_TABLES])
    ccitt = comp in (_COMP_CCITT_MH, _COMP_CCITT_G4)
    if ccitt:
        if bits != 1 or spp != 1:
            raise ValueError("CCITT compression requires 1-bit single-sample")
        if predictor != 1:
            raise ValueError("CCITT does not combine with a predictor")
        if int(tags.get(_TAG_T6_OPTIONS, [0])[0]) & 0x02:
            raise ValueError("T.6 uncompressed mode (T6Options bit 1) unsupported")
        # PhotometricInterpretation: 0 = WhiteIsZero (the bilevel fax
        # default: black flag IS the sample value), 1 = BlackIsZero
        photometric = int(tags.get(_TAG_PHOTOMETRIC, [0])[0])
        if photometric not in (0, 1):
            raise ValueError("CCITT rasters must be bilevel grayscale")

    def _block_values(off: int, cnt: int, rows: int, width_px: int) -> np.ndarray:
        if ccitt:
            from sensordatapipelines_spark.sources.ccitt import (
                g4_decode,
                mh_decode,
            )

            dec = g4_decode if comp == _COMP_CCITT_G4 else mh_decode
            black = dec(payload[int(off) : int(off) + int(cnt)], width_px, rows)
            return black if photometric == 0 else (1 - black)
        if comp == _COMP_JPEG:
            from sensordatapipelines_spark.sources.jpeg import decode_jpeg

            px, _jw, _jh, jc = decode_jpeg(
                _jpeg_tables_merge(
                    jpeg_tables, payload[int(off) : int(off) + int(cnt)]
                )
            )
            if jc != spp:
                raise ValueError(
                    f"TIFF-JPEG strip decoded {jc} channels, "
                    f"SamplesPerPixel says {spp}"
                )
            block = px.tobytes()
            want = rows * width_px * spp
            if len(block) < want:
                block = block + b"\x00" * (want - len(block))
            return np.frombuffer(
                block[:want], dtype=np.uint8
            ).reshape(rows, width_px * spp)
        block = _inflate_block(payload[int(off) : int(off) + int(cnt)], comp)
        want = rows * width_px * spp * dt.itemsize
        if len(block) < want:
            # libtiff tolerates short final blocks; zero-fill the tail
            block = block + b"\x00" * (want - len(block))
        block = block[:want]
        if predictor == 2:
            block = _undo_predictor(block, rows, width_px, spp, dt)
        elif predictor == 3:
            return _undo_fp_predictor(block, rows, width_px, spp, dt)
        return np.frombuffer(block, dtype=dt).reshape(rows, width_px * spp)

    flat = np.zeros((nrows, ncols * spp), dtype=np.float64)
    if _TAG_TILE_OFFSETS in tags:
        tw = int(tags[_TAG_TILE_WIDTH][0])
        th = int(tags[_TAG_TILE_LENGTH][0])
        offsets = tags[_TAG_TILE_OFFSETS]
        counts = tags.get(_TAG_TILE_COUNTS, [tw * th * spp * (bits // 8)] * len(offsets))
        tiles_across = (ncols + tw - 1) // tw
        for ti, (toff, tcnt) in enumerate(zip(offsets, counts)):
            tile = _block_values(toff, tcnt, th, tw)
            r0 = (ti // tiles_across) * th
            c0 = (ti % tiles_across) * tw
            rows_take = min(th, nrows - r0)
            cols_take = min(tw, ncols - c0)
            flat[r0 : r0 + rows_take, c0 * spp : (c0 + cols_take) * spp] = tile[
                :rows_take, : cols_take * spp
            ].astype(np.float64)
    else:
        offsets = tags[_TAG_STRIP_OFFSETS]
        rps = int(tags.get(_TAG_ROWS_PER_STRIP, [nrows])[0])
        counts = tags.get(
            _TAG_STRIP_COUNTS,
            [min(rps, nrows - i * rps) * ncols * spp * (bits // 8)
             for i in range(len(offsets))],
        )
        for si, (soff, scnt) in enumerate(zip(offsets, counts)):
            r0 = si * rps
            rows_here = min(rps, nrows - r0)
            strip = _block_values(soff, scnt, rows_here, ncols)
            flat[r0 : r0 + strip.shape[0], :] = strip.astype(np.float64)

    # chunky layout: row-major (row, col, sample) -> (sample, row, col)
    cube = flat.reshape(nrows, ncols, spp).transpose(2, 0, 1)

    scale = tags.get(_TAG_PIXEL_SCALE, [1.0, 1.0, 0.0])
    tie = tags.get(_TAG_TIEPOINT, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    # tiepoint maps raster (i, j) -> model (x, y): ul = (x - i*sx, y + j*sy)
    sx, sy = float(scale[0]), float(scale[1])
    ulx = float(tie[3]) - float(tie[0]) * sx
    uly = float(tie[4]) + float(tie[1]) * sy
    nodata = None
    if _TAG_GDAL_NODATA in tags:
        try:
            nodata = float(tags[_TAG_GDAL_NODATA][0].strip())
        except (ValueError, AttributeError):
            nodata = None
    meta = {
        "ncols": ncols, "nrows": nrows, "n_bands": spp,
        "sx": sx, "sy": sy, "ulx": ulx, "uly": uly, "nodata": nodata,
    }
    return cube, meta


def open_geotiff(
    spark: SparkSession,
    path: str,
    band: int | None = None,
    origin: str = "corner",
    pattern: str = "*.tif*",
) -> DataFrame:
    """Uncompressed GeoTIFF file(s) → the exploded cell table ``(band,
    px, py, x, y, value, nodata, grid_file)`` that ``zonal_stats``
    consumes — the binary-raster half of the reference's file ingestion
    (``rasterio.open``, ``/root/reference/src/data_preprocessing.py:471``).

    Samples surface as bands ``1..SamplesPerPixel``; ``band=k`` keeps
    only that sample (reference semantics: integer band ids, default all
    — ``:170-171,190-191``). Coordinates follow ``open_ascii_grid``'s
    conventions so cell-table oracles transfer bit-exactly: ``py`` grows
    UPWARD (``py = nrows − 1 − row``; TIFF row 0 is the top row),
    ``origin='corner'`` ⇒ ``x = xll + px·sx``, ``y = yll + py·sy`` with
    ``xll = ulx`` and ``yll = uly − nrows·sy``; ``origin='center'`` adds
    the half-cell offset (the rasterio ``xy()`` center convention).

    File-parallel via the built-in ``binaryFile`` source; the per-file
    decode is an Arrow ``mapInPandas`` kernel (numpy ``frombuffer`` —
    no per-pixel Python). ``nodata`` (GDAL_NODATA tag) surfaces as a
    column for ``zonal_stats`` to filter, keeping the decode faithful."""
    if origin not in ("corner", "center"):
        raise ValueError(f"origin must be 'corner' or 'center', got {origin!r}")
    center = origin == "center"
    want_band = band

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select(F.col("path").alias("grid_file"), "content")
    )

    schema = (
        "band int, px int, py int, x double, y double, "
        "value double, nodata double, grid_file string"
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for gf, payload in zip(pdf["grid_file"], pdf["content"]):
                cube, meta = parse_geotiff(bytes(payload))
                nrows, ncols = meta["nrows"], meta["ncols"]
                sx, sy = meta["sx"], meta["sy"]
                xll = meta["ulx"]
                yll = meta["uly"] - nrows * sy
                px = np.tile(np.arange(ncols, dtype=np.int32), nrows)
                row = np.repeat(np.arange(nrows, dtype=np.int32), ncols)
                py = (nrows - 1) - row
                # same expression shapes as open_ascii_grid's JVM math
                x = xll + px.astype(np.float64) * sx
                y = yll + py.astype(np.float64) * sy
                if center:
                    x = x + sx / 2.0
                    y = y + sy / 2.0
                nod = meta["nodata"]
                for b in range(meta["n_bands"]):
                    if want_band is not None and b + 1 != want_band:
                        continue
                    yield pd.DataFrame(
                        {
                            "band": np.full(px.shape, b + 1, dtype=np.int32),
                            "px": px,
                            "py": py,
                            "x": x,
                            "y": y,
                            "value": cube[b].reshape(-1),
                            "nodata": np.full(
                                px.shape,
                                np.nan if nod is None else nod,
                                dtype=np.float64,
                            ),
                            "grid_file": gf,
                        }
                    )

    out = files.mapInPandas(decode, schema=schema)
    # NaN marker -> SQL NULL so nodata semantics match open_ascii_grid's
    return out.withColumn(
        "nodata", F.when(F.isnan("nodata"), F.lit(None)).otherwise(F.col("nodata"))
    )


def write_geotiff(
    path: str,
    cube: "np.ndarray",
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    upper_left: tuple[float, float] = (0.0, 0.0),
    nodata: float | None = None,
    dtype: str = "f8",
    compression: str = "none",
    predictor: bool | int = False,
) -> None:
    """Minimal little-endian GeoTIFF writer (staging + export parity;
    driver-side, small-raster contract like the GeoJSON sink). ``cube``
    is ``(bands, nrows, ncols)`` or ``(nrows, ncols)``; bands interleave
    chunky (PlanarConfiguration=1) with one strip per row.
    ``upper_left`` is the model coordinate of the raster's top-left
    CORNER; ``dtype`` any of u1/i2/i4/f4/f8; ``compression`` one of
    none/deflate/lzw/packbits (per-strip codecs, the GDAL ``-co
    COMPRESS=`` profiles); ``predictor=True``/``2`` adds horizontal
    differencing (tag 317 = 2, integer dtypes only) and ``predictor=3``
    the floating-point byte-plane predictor (float dtypes only — the
    GDAL ``PREDICTOR=3`` DEM profile)."""
    arr = np.asarray(cube)
    if arr.ndim == 2:
        arr = arr[None, :, :]
    n_bands, nrows, ncols = arr.shape
    dt = np.dtype("<" + dtype)
    sfmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    comp_code = {
        "none": _COMP_NONE, "deflate": _COMP_DEFLATE,
        "lzw": _COMP_LZW, "packbits": _COMP_PACKBITS,
        "jpeg": _COMP_JPEG,
        "ccitt-g4": _COMP_CCITT_G4, "ccitt-mh": _COMP_CCITT_MH,
    }.get(compression)
    if comp_code is None:
        raise ValueError(
            "compression must be none|deflate|lzw|packbits|jpeg|"
            f"ccitt-g4|ccitt-mh, got {compression!r}"
        )
    if comp_code == _COMP_JPEG and (dt != np.dtype("<u1") or n_bands != 1):
        raise ValueError(
            "TIFF-JPEG write supports single-band u1 rasters "
            "(baseline grayscale strips)"
        )
    ccitt_write = comp_code in (_COMP_CCITT_G4, _COMP_CCITT_MH)
    if ccitt_write:
        if dt != np.dtype("<u1") or n_bands != 1:
            raise ValueError("CCITT write takes a single-band u1 bilevel raster")
        if not np.isin(arr, (0, 1)).all():
            raise ValueError("CCITT write requires 0/1 black-flag samples")
        bits = 1  # bilevel: sample value = black flag (WhiteIsZero)
    pred_code = {False: 1, True: 2}[predictor] if isinstance(
        predictor, bool
    ) else int(predictor)
    if pred_code not in (1, 2, 3):
        raise ValueError(f"predictor must be 1/2/3, got {predictor!r}")
    if pred_code == 2 and dt.kind == "f":
        raise ValueError("horizontal predictor requires an integer dtype")
    if pred_code == 3 and dt.kind != "f":
        raise ValueError("floating-point predictor requires a float dtype")
    # chunky interleave rows: (row, col, sample)
    data = np.ascontiguousarray(arr.transpose(1, 2, 0).astype(dt))
    if pred_code == 2:
        # horizontal differencing: sample minus same sample one pixel
        # left, modulo 2^bits (int64 diff + truncating cast)
        wide = data.astype(np.int64)
        wide[:, 1:, :] -= wide[:, :-1, :].copy()
        data = np.ascontiguousarray(wide.astype(dt))
    elif pred_code == 3:
        data = _apply_fp_predictor(data)
    row_bytes = ncols * n_bands * dt.itemsize

    tags: list[tuple[int, int, int, object]] = []  # (tag, type, count, values)

    def add(tag, ftype, values):
        vals = values if isinstance(values, (list, tuple, bytes)) else [values]
        tags.append((tag, ftype, len(vals), vals))

    nodata_ascii = (
        None if nodata is None else (repr(float(nodata)).encode("ascii") + b"\x00")
    )
    add(_TAG_WIDTH, 4, ncols)
    add(_TAG_HEIGHT, 4, nrows)
    add(_TAG_BITS, 3, [bits] * n_bands)
    add(_TAG_COMPRESSION, 3, comp_code)
    # PhotometricInterpretation: WhiteIsZero for bilevel fax (sample =
    # black flag), BlackIsZero otherwise
    add(_TAG_PHOTOMETRIC, 3, 0 if ccitt_write else 1)
    add(_TAG_SAMPLES_PER_PIXEL, 3, n_bands)
    # per-strip payloads (one row each; 8 rows for JPEG so its MCUs are
    # real 8×8 blocks; ALL rows for CCITT — G4 codes each row against the
    # previous one, so a strip boundary would reset the reference line),
    # codec applied independently so any strip stays seekable/decodable
    if ccitt_write:
        rps = nrows
    elif comp_code == _COMP_JPEG:
        rps = 8
    else:
        rps = 1
    raw = data.tobytes()
    strip_raw = [
        raw[r * row_bytes : min(r + rps, nrows) * row_bytes]
        for r in range(0, nrows, rps)
    ]
    jpeg_tables_blob: bytes | None = None
    if comp_code == _COMP_DEFLATE:
        strips = [zlib.compress(s) for s in strip_raw]
    elif comp_code == _COMP_LZW:
        strips = [_lzw_encode(s) for s in strip_raw]
    elif comp_code == _COMP_PACKBITS:
        strips = [_packbits_encode(s) for s in strip_raw]
    elif comp_code == _COMP_JPEG:
        from sensordatapipelines_spark.sources.jpeg import (
            encode_jpeg,
            split_tables,
        )

        # TTN2 shared-tables layout (the GDAL default): DQT/DHT live once
        # in the JPEGTables tag, each strip is an abbreviated stream
        full = [
            encode_jpeg(np.frombuffer(s, np.uint8).reshape(-1, ncols))
            for s in strip_raw
        ]
        jpeg_tables_blob, _ = split_tables(full[0])
        strips = [split_tables(f)[1] for f in full]
    elif ccitt_write:
        from sensordatapipelines_spark.sources.ccitt import (
            g4_encode,
            mh_encode,
        )

        enc = g4_encode if comp_code == _COMP_CCITT_G4 else mh_encode
        strips = [
            enc(np.frombuffer(s, np.uint8).reshape(-1, ncols))
            for s in strip_raw
        ]
    else:
        strips = strip_raw
    strip_counts = [len(s) for s in strips]

    add(_TAG_ROWS_PER_STRIP, 4, rps)
    if jpeg_tables_blob is not None:
        add(_TAG_JPEG_TABLES, 7, jpeg_tables_blob)
    add(_TAG_PLANAR, 3, 1)
    add(_TAG_SAMPLE_FORMAT, 3, [sfmt] * n_bands)
    add(_TAG_PIXEL_SCALE, 12, [float(pixel_scale[0]), float(pixel_scale[1]), 0.0])
    add(_TAG_TIEPOINT, 12,
        [0.0, 0.0, 0.0, float(upper_left[0]), float(upper_left[1]), 0.0])
    if nodata_ascii is not None:
        add(_TAG_GDAL_NODATA, 2, nodata_ascii)
    if pred_code != 1:
        add(_TAG_PREDICTOR, 3, pred_code)
    # strip offsets filled after layout
    add(_TAG_STRIP_OFFSETS, 4, [0] * len(strips))
    add(_TAG_STRIP_COUNTS, 4, strip_counts)
    tags.sort(key=lambda t: t[0])

    n_tags = len(tags)
    ifd_off = 8
    ifd_size = 2 + 12 * n_tags + 4
    overflow_off = ifd_off + ifd_size
    # lay out out-of-line values
    overflow: list[bytes] = []
    cur = overflow_off

    def pack_vals(ftype, vals):
        if ftype == 2:
            return bytes(vals) if isinstance(vals, (bytes, bytearray)) else vals[0]
        fmt, _sz = _TYPE_FMT[ftype]
        return struct.pack("<" + str(len(vals)) + fmt, *vals)

    # first pass to compute data start (strip offsets depend on it)
    sizes = []
    for tag, ftype, count, vals in tags:
        _fmt, sz = _TYPE_FMT[ftype]
        total = sz * count
        sizes.append(total if total > 4 else 0)
    data_off = cur + sum((s + 1) & ~1 for s in sizes)
    # now fill strip offsets with real (cumulative, codec-sized) positions;
    # each strip is padded to EVEN length on disk (TIFF 6.0 requires all
    # offset values word-aligned — odd-length compressed strips would
    # otherwise shift every later offset onto an odd byte and strict
    # readers may reject the file; StripByteCounts still records the true
    # unpadded codec size)
    strip_offsets = []
    pos = data_off
    for c in strip_counts:
        strip_offsets.append(pos)
        pos += (c + 1) & ~1
    final_tags = []
    for tag, ftype, count, vals in tags:
        if tag == _TAG_STRIP_OFFSETS:
            vals = strip_offsets
        final_tags.append((tag, ftype, count, vals))

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", n_tags)
    for tag, ftype, count, vals in final_tags:
        _fmt, sz = _TYPE_FMT[ftype]
        total = sz * count
        packed = pack_vals(ftype, vals)
        if total <= 4:
            out += struct.pack("<HHI", tag, ftype, count) + packed.ljust(4, b"\x00")
        else:
            out += struct.pack("<HHII", tag, ftype, count, cur)
            overflow.append(packed + (b"\x00" if len(packed) % 2 else b""))
            cur += len(overflow[-1])
    out += struct.pack("<I", 0)  # next-IFD pointer: none
    for blob in overflow:
        out += blob
    assert len(out) == data_off, (len(out), data_off)
    for s in strips:
        out += s
        if len(s) % 2:
            out += b"\x00"  # word-align the next strip's offset
    with open(path, "wb") as f:
        f.write(bytes(out))
