"""Minimal, genuine GIF89a codec — pure stdlib (``struct`` only).

GIF's critical path is LZW with variable-width codes (GIF89a spec
appendix F), which is entirely expressible in plain Python: this module
implements the real thing — container framing (header, logical screen
descriptor, global color table, image descriptor, data sub-blocks,
trailer), LSB-first variable-width bit packing, and LZW compression
with clear-code resets at dictionary saturation — for the subset that
covers ML-pipeline image payloads:

  * one image per file, global color table, no interlace,
    no transparency/animation extensions
  * palette sizes 4..256 (LZW minimum code size 2..8)
  * the encoder emits a CLEAR and resets when the dictionary reaches
    4096 codes (the decoder also accepts streams that instead keep
    using the full dictionary — "deferred clear")

Code-width convention: the width grows when the NEXT code to be
assigned no longer fits the current width (the GIF89a rule, no
"early change").  Anything outside the subset raises ``ValueError``
with the reason — honest failure, not silent garbage.

Interop caveat (stated in the repo's own notes before this was
written): with no external reference decoder in the container, the
validation is roundtrip + hand-computed spec anchors (tests build the
canonical bit-packing for tiny images by hand), the same epistemic
footing as the JPEG codec's analytic anchors.
"""

from __future__ import annotations

import struct

_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


class _BitWriter:
    """LSB-first bit packer (GIF appendix F byte order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> bytes:
        if self._nbits:
            self.out.append(self._acc & 0xFF)
            self._acc, self._nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    """LSB-first bit unpacker."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        end = self.pos + width
        if end > len(self.data) * 8:
            raise ValueError("LZW stream truncated mid-code")
        v = 0
        got = 0
        while got < width:
            byte = self.data[(self.pos + got) // 8]
            bit_off = (self.pos + got) % 8
            take = min(8 - bit_off, width - got)
            v |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        self.pos = end
        return v


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable-width codes starting at
    ``min_code_size + 1`` bits, CLEAR emitted first and again whenever
    the dictionary saturates at 4096."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("min code size must be 2..8 (GIF spec)")
    clear = 1 << min_code_size
    eoi = clear + 1
    limit = 1 << min_code_size
    for b in indices:
        if b >= limit:
            raise ValueError(f"pixel index {b} exceeds palette size {limit}")

    w = _BitWriter()

    def reset():
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    w.write(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        w.write(table[run], width)
        table[cand] = next_code
        next_code += 1
        # mirror of the decoder's growth rule: width covers next_code
        if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        run = bytes([b])
        if next_code >= _DICT_LIMIT:
            w.write(table[run], width)
            w.write(clear, width)
            table, next_code, width = reset()
            run = b""
    if run:
        w.write(table[run], width)
    w.write(eoi, width)
    return w.flush()


def lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Inverse of :func:`lzw_encode`; also accepts deferred-clear
    streams (a full dictionary simply stops growing)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("min code size must be 2..8 (GIF spec)")
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _BitReader(data)
    out = bytearray()

    def reset():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset()
    prev: bytes | None = None
    while True:
        code = r.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first code after clear must be a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} beyond dictionary")
        out += entry
        if prev is not None and len(table) < _DICT_LIMIT:
            table.append(prev + entry[:1])
            # the decoder's dictionary trails the encoder's by one entry
            # (the encoder adds BEFORE emitting the next code, the
            # decoder AFTER reading it), so the width grows one code
            # early relative to the encoder's next_code == 2^width rule
            if len(table) == (1 << width) - 1 and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError("LZW produced more pixels than the image holds")
    if len(out) != n_expected:
        raise ValueError(
            f"LZW produced {len(out)} pixels, image descriptor says {n_expected}"
        )
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def build_gif(width: int, height: int, palette: bytes, indices: bytes) -> bytes:
    """A valid single-image GIF89a: header + logical screen descriptor +
    global color table + image descriptor + LZW data sub-blocks +
    trailer.  ``palette`` is RGB triples (a power-of-two count, 4..256);
    ``indices`` is one palette index per pixel, row-major."""
    if width < 1 or height < 1 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError("dimensions out of GIF range")
    if len(palette) % 3:
        raise ValueError("palette must be RGB triples")
    n_colors = len(palette) // 3
    if n_colors < 4 or n_colors > 256 or n_colors & (n_colors - 1):
        raise ValueError("palette size must be a power of two in 4..256")
    if len(indices) != width * height:
        raise ValueError("need exactly width*height pixel indices")
    depth = n_colors.bit_length() - 1  # log2
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table flag, color depth
    packed = 0x80 | ((depth - 1) << 4) | (depth - 1)
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    out += palette
    # image descriptor (no local color table, no interlace)
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    min_code_size = max(2, depth)
    out.append(min_code_size)
    out += _sub_blocks(lzw_encode(indices, min_code_size))
    out += b"\x3B"
    return bytes(out)


def parse_gif(data: bytes):
    """Parse a single-image GIF built by :func:`build_gif` (or any
    conforming single-image/no-extension GIF): returns
    ``(width, height, palette, indices)`` with the pixels REALLY
    LZW-decoded from the container bytes."""
    if len(data) < 13 or data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF signature")
    width, height, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if not packed & 0x80:
        raise ValueError("global color table required in this subset")
    n_colors = 2 << (packed & 0x07)
    palette = bytes(data[pos : pos + 3 * n_colors])
    if len(palette) != 3 * n_colors:
        raise ValueError("truncated color table")
    pos += 3 * n_colors
    if pos >= len(data) or data[pos] != 0x2C:
        raise ValueError("expected image descriptor (extensions unsupported)")
    left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
    if ipacked & 0xC0:
        raise ValueError("local color tables / interlace unsupported")
    if (left, top, iw, ih) != (0, 0, width, height):
        raise ValueError("sub-rectangle images unsupported")
    pos += 10
    if pos >= len(data):
        raise ValueError("truncated before LZW minimum code size")
    min_code_size = data[pos]
    pos += 1
    stream = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated in data sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(data):
            raise ValueError("sub-block runs past the file")
        stream += data[pos : pos + n]
        pos += n
    if pos >= len(data) or data[pos] != 0x3B:
        raise ValueError("missing GIF trailer")
    indices = lzw_decode(bytes(stream), min_code_size, width * height)
    return width, height, palette, indices
