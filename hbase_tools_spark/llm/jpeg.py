"""Baseline JPEG codec — pure Python/numpy, spec-faithful (ITU T.81).

The container has no libjpeg/PIL, but baseline sequential JPEG is
fully expressible from the spec: marker segments, 8x8 DCT, zigzag,
quantization, differential DC + run-length AC coding, canonical
Huffman entropy coding with byte stuffing.  This module implements
BOTH directions for the subset:

  * baseline sequential DCT (SOF0), 8-bit samples
  * grayscale (1 component) and YCbCr 4:4:4 (3 components,
    no chroma subsampling); restart markers and progressive
    scans are rejected with ``ValueError``

The encoder emits CANONICAL HUFFMAN TABLES BUILT FROM THE DATA in DHT
segments (the spec's tables are just defaults — every decoder must
read DHT), which keeps this implementation free of transcribed
constant tables; the decoder parses whatever DQT/DHT the file
carries, so it is exercised as a real spec decoder, not a mirror of
this encoder's choices.  Honesty note: unlike the PNG codec (whose
CRC-32/DEFLATE layers are externally pinned by zlib), JPEG
correctness here rests on spec fidelity plus ANALYTIC anchors in the
tests — uniform blocks must round-trip exactly under unit
quantization, single-frequency cosine patterns must survive, and
random images must meet a PSNR floor.  Interop with third-party
baseline JPEGs is expected but not independently verified in this
container.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# 8x8 DCT (T.81 A.3.3) as an orthonormal matrix product
# ---------------------------------------------------------------------------

_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _T.T @ coef @ _T


# zigzag scan order (T.81 Figure A.6)
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

#: default quantization tables: a mild frequency ramp (any table is
#: valid — it travels in DQT); unit tables give near-lossless mode
_QT_LUMA = np.clip(1 + (np.arange(64).reshape(8, 8) // 8
                        + np.arange(64).reshape(8, 8) % 8) * 2, 1, 255)
_QT_CHROMA = np.clip(_QT_LUMA * 2, 1, 255)


def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    x = coef / q
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int32
    )


def _category(v: int) -> int:
    """JPEG magnitude category SSSS: number of bits of |v|."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits: int, ssss: int) -> int:
    """T.81 F.2.2.1 EXTEND: map SSSS received bits to a signed value."""
    if ssss == 0:
        return 0
    if bits < (1 << (ssss - 1)):
        return bits - (1 << ssss) + 1
    return bits


# ---------------------------------------------------------------------------
# Canonical Huffman
# ---------------------------------------------------------------------------


def _canonical_codes(symbols: list):
    """Flat canonical Huffman over the OBSERVED symbol set: every
    symbol gets a code of length ceil(log2(n)) or that length + 1 —
    valid (Kraft-complete prefixes are not required by JPEG; unused
    codes are fine), deterministic, and depth <= 8 for <= 256 symbols.
    Returns ({symbol: (code, length)}, bits[16], huffval list)."""
    syms = sorted(set(symbols))
    n = len(syms)
    if n == 0:
        raise ValueError("empty symbol set")
    if n == 1:
        # Huffman needs >= 1 bit; assign the single symbol code '0'
        length = 1
    else:
        length = (n - 1).bit_length()
        if (1 << length) == n:
            # all-codes-used at this length would make the all-ones
            # code legal; JPEG reserves the all-ones prefix, so bump
            length += 1
    codes = {s: (i, length) for i, s in enumerate(syms)}
    bits = [0] * 16
    bits[length - 1] = n
    return codes, bits, syms


def _parse_dht_tables(bits: list, huffval: list):
    """Decoder side: canonical code assignment from (BITS, HUFFVAL) —
    T.81 Annex C.  Returns {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
        # Drop emitted bits: an unmasked accumulator grows into an
        # unbounded bigint whose every shift copies the whole history —
        # measured quadratic (512x512 encode 17 s vs 0.5 s masked).
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill (spec convention)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy-coded segment exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker inside scan")
            self.pos += 1  # skip the stuffed 0x00
        # Mask to the live window — same unbounded-bigint trap as the
        # writer (512x512 decode 45 s unmasked vs 0.6 s).
        self.acc = (((self.acc << 8) | b) & ((1 << (self.nbits + 8)) - 1))
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in scan")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _blocks_of(plane: np.ndarray):
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            yield padded[by : by + 8, bx : bx + 8]


def _encode_component_coefs(plane: np.ndarray, q: np.ndarray):
    """Per block: quantized coefficients in zigzag order."""
    out = []
    for block in _blocks_of(plane.astype(np.float64) - 128.0):
        zz = _quantize(_dct2(block), q).flatten()[_ZZ]
        out.append(zz)
    return out


def _rle_symbols(blocks, prev_dc: int):
    """(DC symbols+bits, AC symbols+bits) per block — T.81 F.1.2."""
    dc_items, ac_items = [], []
    for zz in blocks:
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
        s = _category(diff)
        # Uniform (symbol, extra_value, extra_len) shape shared with the
        # AC items; for DC the Huffman symbol IS the extra-bit count, so
        # the first and third fields are intentionally the same `s`.
        dc_items.append((s, diff if diff >= 0 else diff + (1 << s) - 1, s))
        acs = []
        run = 0
        last_nz = 0
        for i in range(1, 64):
            if zz[i] != 0:
                last_nz = i
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))  # ZRL
                run -= 16
            s = _category(v)
            acs.append(
                ((run << 4) | s, v if v >= 0 else v + (1 << s) - 1, s)
            )
            run = 0
        if last_nz != 63:
            acs.append((0x00, 0, 0))  # EOB
        ac_items.append(acs)
    return dc_items, ac_items, prev_dc


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    qt_luma: np.ndarray | None = None,
    qt_chroma: np.ndarray | None = None,
) -> bytes:
    """Encode 8-bit pixels (row-major; gray or RGB) as a baseline
    sequential JPEG with data-derived canonical Huffman tables."""
    if channels not in (1, 3):
        raise ValueError("only grayscale or RGB input")
    if not (1 <= width <= 65535 and 1 <= height <= 65535):
        raise ValueError("dimensions must fit the 16-bit SOF fields")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    ql = (_QT_LUMA if qt_luma is None else np.asarray(qt_luma).reshape(8, 8))
    qc = (
        _QT_CHROMA
        if qt_chroma is None
        else np.asarray(qt_chroma).reshape(8, 8)
    )
    for qt in (ql, qc):
        if not ((qt >= 1) & (qt <= 255)).all():
            raise ValueError("quant table values must be in 1..255")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    )
    if channels == 3:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        qtabs = [ql, qc, qc]
        qids = [0, 1, 1]
    else:
        planes = [img[:, :, 0].astype(np.float64)]
        qtabs = [ql]
        qids = [0]
    comp_blocks = [
        _encode_component_coefs(p, q) for p, q in zip(planes, qtabs)
    ]
    # one scan interleaving components MCU by MCU (all h=v=1 -> one
    # block per component per MCU)
    n_mcus = len(comp_blocks[0])
    dc_syms: dict[int, list] = {0: [], 1: []}
    ac_syms: dict[int, list] = {0: [], 1: []}
    per_comp = []
    for ci, blocks in enumerate(comp_blocks):
        dci, aci, _ = _rle_symbols(blocks, 0)
        per_comp.append((dci, aci))
        tid = 0 if ci == 0 else 1
        dc_syms[tid].extend(s for s, _, _ in dci)
        ac_syms[tid].extend(s for a in aci for s, _, _ in a)
    tables = {}
    dht = bytearray()
    for cls, per_tid in ((0, dc_syms), (1, ac_syms)):
        for tid, syms in per_tid.items():
            if not syms:
                continue
            codes, bits, huffval = _canonical_codes(syms)
            tables[(cls, tid)] = codes
            body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval)
            dht += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    bw = _BitWriter()
    for m in range(n_mcus):
        for ci in range(len(comp_blocks)):
            tid = 0 if ci == 0 else 1
            dci, aci = per_comp[ci]
            s, extra, nb = dci[m]
            code, ln = tables[(0, tid)][s]
            bw.write(code, ln)
            if nb:
                bw.write(extra, nb)
            for s, extra, nb in aci[m]:
                code, ln = tables[(1, tid)][s]
                bw.write(code, ln)
                if nb:
                    bw.write(extra, nb)
    scan = bw.flush()
    out = bytearray(b"\xff\xd8")  # SOI
    for tid, q in ((0, ql),) + (((1, qc),) if channels == 3 else ()):
        body = bytes([tid]) + bytes(
            int(q.flatten()[z]) for z in _ZZ
        )
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = channels
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])  # h=v=1
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += dht
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])  # Ss, Se, AhAl (baseline)
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes):
    """Decode a baseline sequential JPEG (subset documented in the
    module docstring) into ``(width, height, channels, bytes)``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple, dict] = {}
    frame = None
    comps = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker.
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64)
                tbl[_ZZ] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                )
                qts[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(body[i + 17 : i + 17 + n])
                hts[(cls, tid)] = _parse_dht_tables(bits, huffval)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec = body[0]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (h=v=1 only)"
                    )
                comps.append({"id": cid, "tq": tq})
            frame = (w, h, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG frame unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scomp = []
            for ci in range(ns):
                cid, tids = body[1 + 2 * ci : 3 + 2 * ci]
                scomp.append({"id": cid, "dc": tids >> 4, "ac": tids & 0xF})
            if frame is None:
                raise ValueError("SOS before SOF")
            w, h, nc = frame
            if ns != nc:
                raise ValueError(
                    "non-interleaved scans unsupported (ns != nc)"
                )
            for sc in scomp:
                if (0, sc["dc"]) not in hts or (1, sc["ac"]) not in hts:
                    raise ValueError("scan references undefined DHT table")
            for c in comps:
                if c["tq"] not in qts:
                    raise ValueError("frame references undefined DQT table")
            # Entropy data runs to the EOI marker.  Without restart
            # intervals (rejected above) every 0xFF inside the scan is
            # stuffed as FF 00, so the first FF D9 is the terminator —
            # trailing bytes after EOI (common in real files) are fine.
            scan_end = data.find(b"\xff\xd9", pos + seglen)
            if scan_end < 0:
                raise ValueError("missing EOI")
            br = _BitReader(data[pos + seglen : scan_end])
            bw8, bh8 = (w + 7) // 8, (h + 7) // 8
            planes = [np.zeros((bh8 * 8, bw8 * 8)) for _ in range(nc)]
            prev_dc = [0] * nc
            for my in range(bh8):
                for mx in range(bw8):
                    for ci in range(nc):
                        sc = scomp[ci]
                        dct = hts[(0, sc["dc"])]
                        act = hts[(1, sc["ac"])]
                        zz = np.zeros(64, dtype=np.int64)
                        ssss = br.read_symbol(dct)
                        diff = _extend(br.read_bits(ssss), ssss)
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = br.read_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64)
                        coef[_ZZ] = zz
                        q = qts[comps[ci]["tq"]]
                        block = _idct2(coef.reshape(8, 8) * q) + 128.0
                        planes[ci][
                            my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8
                        ] = block
            planes = [p[:h, :w] for p in planes]
            if nc == 3:
                y, cb, cr = planes
                cb = cb - 128.0
                cr = cr - 128.0
                rgb = np.stack(
                    [
                        y + 1.402 * cr,
                        y - 0.344136 * cb - 0.714136 * cr,
                        y + 1.772 * cb,
                    ],
                    axis=2,
                )
                out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
            else:
                out = np.clip(np.round(planes[0]), 0, 255).astype(
                    np.uint8
                )[:, :, None]
            return w, h, nc, out.tobytes()
        pos += seglen
    raise ValueError("no scan found")
