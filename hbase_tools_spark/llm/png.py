"""Minimal, genuine PNG codec — pure stdlib (``zlib``/``struct``).

The container has no PIL/libpng, but PNG's critical path is entirely
stdlib-expressible: chunk framing with CRC-32, DEFLATE via ``zlib``,
and the five scanline filters of the PNG spec (RFC 2083 §6).  This
module implements the real thing — not a stub — for the subset that
covers ML-pipeline image payloads:

  * bit depth 8; color types 0 (grayscale), 2 (RGB), 6 (RGBA)
  * non-interlaced; filters 0-4 (None/Sub/Up/Average/Paeth) on decode,
    selectable per-row filter on encode (tests round-trip all five)

Anything outside the subset raises ``ValueError`` with the reason —
honest failure, not silent garbage.  The multimodal operators use this
for a REAL encode→decode path on image payloads
(``multimodal_png_stats``); JPEG/video remain honestly stubbed
(entropy-coded codecs genuinely need external libraries).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, RGB, RGBA


def _chunk(ctype: bytes, data: bytes) -> bytes:
    body = ctype + data
    return struct.pack(">I", len(data)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    row_filters=None,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels``
    bytes) into a valid PNG.  ``row_filters`` optionally assigns a
    filter type (0-4) per row — the encoder applies the real filter math,
    which is how the decoder's five unfilter branches get exercised by
    tests; default is filter 0 everywhere."""
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if width < 1 or height < 1:
        raise ValueError("width and height must be nonzero (PNG spec)")
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, need {stride * height}"
        )
    if row_filters is None:
        row_filters = [0] * height
    elif len(row_filters) != height:
        raise ValueError(
            f"row_filters has {len(row_filters)} entries, need {height}"
        )
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ft = row_filters[y]
        raw.append(ft)
        if ft == 0:
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - ch] if i >= ch else 0) + prev[i]) // 2)
                & 0xFF
                for i in range(stride)
            )
        elif ft == 4:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"unknown filter type {ft}")
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes):
    """Decode a PNG into ``(width, height, channels, bytes pixels)``
    (row-major 8-bit).  Verifies the signature and every chunk CRC;
    supports the module-documented subset and raises ``ValueError``
    outside it."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk body")
        crc_bytes = data[pos + 8 + length : pos + 12 + length]
        if len(crc_bytes) != 4:
            raise ValueError("truncated chunk CRC")
        (crc,) = struct.unpack(">I", crc_bytes)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"IHDR body must be 13 bytes, got {len(body)}")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if width < 1 or height < 1:
        raise ValueError("width and height must be nonzero (PNG spec)")
    ch = _CHANNELS[color_type]
    stride = width * ch
    expected = (stride + 1) * height
    # decompressobj with max_length bounds inflation BEFORE allocation:
    # a few-KB IDAT can claim tiny dimensions while inflating to GBs (a
    # decompression bomb would otherwise OOM the executor before the
    # size check below ever ran).
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt deflate stream in IDAT: {exc}") from exc
    if len(raw) != expected or dec.unconsumed_tail or not dec.eof:
        raise ValueError("decompressed size does not match dimensions")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, ch, bytes(out)
