"""G.711 companded audio codecs — REAL mu-law and A-law, built from
the public ITU-T Recommendation G.711 (1988) segment/companding tables
and the Microsoft WAVE ``wFormatTag`` 7 (mu-law) / 6 (A-law) container
layout.  No code copied from anywhere — written from the segment
layout in the spec (8 exponent segments x 16 mantissa steps, sign bit,
mu-law bias 132, A-law even-bit inversion 0x55).

Extends the honest-codec family (PNG, JPEG, GIF, WAV PCM, MP4 boxes,
MJPEG/MJPD/MJPM video, IMA ADPCM in the sibling modules) with the
telephony workhorse: a 2:1 logarithmic PCM coder.  Reference parity
note: the reference repo (NorsaG/hbase-tools) has no media path — this
family exists for the LLM-data-pipeline surface (multimodal corpus
ingestion), per SURVEY.md §2.9.

Codec properties the query certifies:

- Every SAMPLE is one byte, coded independently: the format is
  splittable at byte granularity (the strongest possible parallel
  -decode story at 100 TB — any task can decode any byte range).
- The coder is IDEMPOTENT on its own reconstruction:
  ``encode(decode(encode(x))) == encode(x)`` bit-exactly, because
  decode returns each quantization cell's midpoint and the midpoint
  re-encodes to the same cell.  This is the lossy-codec analog of the
  ADPCM closed-loop certificate (exhaustively verified over all 256
  codes in tests).
- Compressed size has the closed form ``n_bytes == n_samples``.
- Decimating the COMPRESSED stream commutes with decimating the
  decoded samples (per-byte independence made operational: resampling
  never requires a decode of the discarded bytes).
"""

from __future__ import annotations

import struct

import numpy as np

MULAW_BIAS = 0x84  # 132, the G.711 mu-law bias
MULAW_CLIP = 32635  # 0x7FFF - BIAS rounding headroom, per the spec
ALAW_AMI = 0x55  # alternate-bit inversion applied to every A-law code

# Segment thresholds: exponent k covers magnitudes [2^(k+7), 2^(k+8))
# after biasing (mu-law) / in the 13-bit A-law domain.
_SEG_THRESH = np.array(
    [0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000], dtype=np.int64
)
_ALAW_THRESH = np.array(
    [0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000], dtype=np.int64
)


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16-range samples -> uint8 mu-law codes (vectorized)."""
    s = np.asarray(samples, dtype=np.int64)
    sign = np.where(s < 0, 0x80, 0x00).astype(np.int64)
    mag = np.minimum(np.abs(s), MULAW_CLIP) + MULAW_BIAS
    exp = (mag[:, None] >= _SEG_THRESH[None, :]).sum(axis=1)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> int16 samples (cell midpoints)."""
    c = (~np.asarray(codes, dtype=np.int64)) & 0xFF
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) + MULAW_BIAS) << exp) - MULAW_BIAS
    return np.where(c & 0x80, -mag, mag).astype(np.int64)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16-range samples -> uint8 A-law codes (vectorized).  A-law
    codes the top 13 bits; sign bit 0x80 marks NON-negative (spec
    convention), and every code is XORed with 0x55."""
    s = np.asarray(samples, dtype=np.int64)
    sign = np.where(s >= 0, 0x80, 0x00).astype(np.int64)
    mag = np.minimum(np.where(s >= 0, s, -s - 1), 0x7FFF)
    exp = (mag[:, None] >= _ALAW_THRESH[None, :]).sum(axis=1)
    mant = np.where(exp == 0, mag >> 4, mag >> (exp + 3)) & 0x0F
    return (((sign | (exp << 4) | mant) ^ ALAW_AMI) & 0xFF).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law codes -> int16 samples (cell midpoints)."""
    c = (np.asarray(codes, dtype=np.int64) ^ ALAW_AMI) & 0xFF
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << (exp - 1),
    )
    return np.where(c & 0x80, mag, -mag - 1).astype(np.int64)


_G711_TAGS = {"mulaw": 7, "alaw": 6}


def build_wav_g711(sample_rate: int, samples: np.ndarray, law: str) -> bytes:
    """Real RIFF/WAVE container for G.711: ``wFormatTag`` 7 (mu-law)
    or 6 (A-law), mono, 8 bits/sample, block align 1, fact chunk with
    the sample count (required for compressed formats)."""
    codes = mulaw_encode(samples) if law == "mulaw" else alaw_encode(samples)
    payload = codes.tobytes()
    tag = _G711_TAGS[law]
    fmt = struct.pack(
        "<4sIHHIIHHH", b"fmt ", 18, tag, 1, sample_rate,
        sample_rate, 1, 8, 0,
    )
    fact = struct.pack("<4sII", b"fact", 4, len(samples))
    data = struct.pack("<4sI", b"data", len(payload)) + payload
    if len(payload) & 1:
        data += b"\x00"  # RIFF chunks are word-aligned
    body = fmt + fact + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


def parse_wav_g711(b: bytes) -> tuple[dict, np.ndarray]:
    """Parse + fully decode a G.711 WAV.  Returns (info, samples):
    info carries the container facts the query certifies; samples are
    the decoded int16 values truncated to the fact-chunk count."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = fact = payload = None
    while pos + 8 <= len(b):
        cid, sz = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + sz]
        if len(body) < sz:
            raise ValueError("g711 wav: torn data chunk")
        if cid == b"fmt ":
            # A legal fmt chunk may be the 16-byte PCM layout (no
            # cbSize); unpack the common 16-byte prefix and keep the
            # module's ValueError contract for torn chunks instead of
            # leaking struct.error (round-10 ADVICE).
            if sz < 16:
                raise ValueError("g711 wav: torn fmt chunk")
            tag, ch, rate, brate, balign, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt = dict(tag=tag, channels=ch, sample_rate=rate,
                       byte_rate=brate, block_align=balign, bits=bits)
        elif cid == b"fact":
            (fact,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or fact is None or payload is None:
        raise ValueError("g711 wav: missing chunk")
    if fmt["tag"] not in (6, 7) or fmt["bits"] != 8 or fmt["channels"] != 1:
        raise ValueError("not mono G.711")
    codes = np.frombuffer(payload[:fact], dtype=np.uint8)
    dec = mulaw_decode(codes) if fmt["tag"] == 7 else alaw_decode(codes)
    fmt["n_samples"] = int(fact)
    fmt["compressed_bytes"] = int(fact)
    return fmt, dec
