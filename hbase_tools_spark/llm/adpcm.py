"""IMA ADPCM audio codec — REAL 4-bit adaptive-differential PCM, built
from the public IMA Digital Audio Focus Group recommendation (1992) and
the Microsoft WAVE `wFormatTag = 0x0011` container layout (the same
public specs `multimedia/dvi_adpcm` implementations follow; no code
copied from anywhere — written from the tables in the spec).

Extends the honest-codec family (PNG inflate+filters, JPEG Huffman,
GIF LZW, WAV PCM, MP4 boxes, MJPEG/MJPD/MJPM video in the sibling
modules) with real lossy AUDIO compression: a 4:1 sample-rate-preserving
coder whose per-sample quantizer step adapts to the signal.  Reference
parity note: the reference repo (NorsaG/hbase-tools) has no media path
at all — this family exists for the LLM-data-pipeline surface
(multimodal corpus ingestion), per SURVEY.md §2.9.

Spec facts this module implements exactly:

- 89-entry step-size table, 8-entry index-adjust table.
- Per-nibble reconstruction ``diff = step>>3 (+ step if b2) (+ step>>1
  if b1) (+ step>>2 if b0)``, sign in bit 3, predictor clamped to
  int16, step index clamped to [0, 88].
- The ENCODER runs the decoder's reconstruction in its loop (closed
  loop): encode state and decode state advance identically, so
  ``decode(encode(x))`` equals the encoder's own reconstruction
  bit-exactly — certified as ``closed_loop_ok`` by the query.
- WAV block layout (`block_align` bytes): 4-byte header (int16 first
  sample verbatim, uint8 step index, uint8 reserved) + nibble payload,
  low nibble first; ``samples_per_block = (block_align - 4) * 2 + 1``.
  Blocks are independently decodable (the header re-seeds the
  predictor), which is what makes the DECODE side embarrassingly
  parallel at 100 TB: a splittable format, one task per block range.
- `fact` chunk carries the true sample count; the final block is
  padded by repeating the last sample, so compressed size has the
  closed form ``n_blocks * block_align`` the DuckDB oracle predicts.
"""

from __future__ import annotations

import struct

import numpy as np

# IMA ADPCM step-size table (89 entries) — public spec constants.
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)

# Index adjustment per 3-bit magnitude — public spec constants.
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)

BLOCK_ALIGN = 256
SAMPLES_PER_BLOCK = (BLOCK_ALIGN - 4) * 2 + 1  # 505


def _encode_nibble(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One encoder step: quantize (sample - pred) at the current step,
    return (nibble, new_pred, new_index) with new_pred advanced through
    the DECODER's reconstruction (closed loop)."""
    step = int(STEP_TABLE[index])
    diff = sample - pred
    nibble = 0
    if diff < 0:
        nibble = 8
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    # Decoder-identical reconstruction.
    delta = step >> 3
    if nibble & 4:
        delta += step
    if nibble & 2:
        delta += step >> 1
    if nibble & 1:
        delta += step >> 2
    pred = pred - delta if nibble & 8 else pred + delta
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(INDEX_TABLE[nibble & 7])))
    return nibble, pred, index


def adpcm_encode(samples: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode int16 mono samples to IMA ADPCM block payload bytes.

    Returns ``(blocks_bytes, reconstruction)`` — the encoder's own
    closed-loop reconstruction (what any correct decoder must emit for
    the first ``len(samples)`` samples).  The final block is padded by
    repeating the last sample so the payload is a whole number of
    ``BLOCK_ALIGN``-byte blocks."""
    # Clamp to int16 range up front: the block header packs the first
    # sample with '<h', and the byte-pair text derivation can exceed
    # int16 on non-ASCII input (bytes >= 0x80 in the high position) —
    # degrade like the in-loop predictor clamp instead of crashing.
    samples = np.clip(np.asarray(samples, dtype=np.int64), -32768, 32767)
    ns = len(samples)
    if ns == 0:
        raise ValueError("adpcm_encode: empty input")
    spb = SAMPLES_PER_BLOCK
    n_blocks = (ns + spb - 1) // spb
    padded = np.empty(n_blocks * spb, dtype=np.int64)
    padded[:ns] = samples
    padded[ns:] = samples[-1]

    out = bytearray()
    recon = np.empty(n_blocks * spb, dtype=np.int64)
    index = 0
    pos = 0
    for _ in range(n_blocks):
        first = int(padded[pos])
        # Header re-seeds the predictor: blocks decode independently.
        out += struct.pack("<hBB", first, index, 0)
        pred = first
        recon[pos] = first
        nibbles = []
        for i in range(1, spb):
            nib, pred, index = _encode_nibble(
                int(padded[pos + i]), pred, index
            )
            recon[pos + i] = pred
            nibbles.append(nib)
        # Low nibble first, per the WAV layout.
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
        pos += spb
    return bytes(out), recon[:ns]


def adpcm_decode_block(block: bytes) -> np.ndarray:
    """Decode one ``BLOCK_ALIGN``-byte block to its SAMPLES_PER_BLOCK
    int16 samples — self-contained given the block header."""
    if len(block) != BLOCK_ALIGN:
        raise ValueError("adpcm: short block")
    pred, index, _rsv = struct.unpack_from("<hBB", block, 0)
    if index > 88:
        raise ValueError("adpcm: bad step index")
    out = np.empty(SAMPLES_PER_BLOCK, dtype=np.int64)
    out[0] = pred
    k = 1
    for byte in block[4:]:
        for nib in (byte & 0xF, byte >> 4):
            step = int(STEP_TABLE[index])
            delta = step >> 3
            if nib & 4:
                delta += step
            if nib & 2:
                delta += step >> 1
            if nib & 1:
                delta += step >> 2
            pred = pred - delta if nib & 8 else pred + delta
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(INDEX_TABLE[nib & 7])))
            out[k] = pred
            k += 1
    return out


def build_wav_adpcm(sample_rate: int, samples: np.ndarray) -> bytes:
    """Real RIFF/WAVE container, ``wFormatTag = 0x0011`` (IMA ADPCM),
    mono: fmt chunk with the 2-byte samples-per-block extension, fact
    chunk with the true sample count, data chunk of whole blocks."""
    payload, _ = adpcm_encode(samples)
    ns = len(samples)
    spb = SAMPLES_PER_BLOCK
    byte_rate = (sample_rate * BLOCK_ALIGN + spb - 1) // spb
    fmt = struct.pack(
        "<4sIHHIIHHHH", b"fmt ", 20, 0x0011, 1, sample_rate,
        byte_rate, BLOCK_ALIGN, 4, 2, spb,
    )
    fact = struct.pack("<4sII", b"fact", 4, ns)
    data = struct.pack("<4sI", b"data", len(payload)) + payload
    body = fmt + fact + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


def parse_wav_adpcm(b: bytes) -> tuple[dict, np.ndarray]:
    """Parse + fully decode an IMA-ADPCM WAV.  Returns (info, samples)
    where info carries the container facts the query certifies and
    samples is truncated to the fact-chunk length."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = fact = None
    payload = None
    while pos + 8 <= len(b):
        cid, sz = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            tag, ch, rate, brate, balign, bits, cb, spb = struct.unpack_from(
                "<HHIIHHHH", body, 0
            )
            fmt = dict(tag=tag, channels=ch, sample_rate=rate,
                       byte_rate=brate, block_align=balign, bits=bits,
                       cb=cb, samples_per_block=spb)
        elif cid == b"fact":
            (fact,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or fact is None or payload is None:
        raise ValueError("adpcm wav: missing chunk")
    if fmt["tag"] != 0x0011 or fmt["bits"] != 4 or fmt["channels"] != 1:
        raise ValueError("not mono IMA ADPCM")
    if fmt["block_align"] != BLOCK_ALIGN or \
            fmt["samples_per_block"] != SAMPLES_PER_BLOCK:
        raise ValueError("unexpected block geometry")
    if len(payload) % BLOCK_ALIGN:
        raise ValueError("adpcm: torn data chunk")
    n_blocks = len(payload) // BLOCK_ALIGN
    out = np.empty(n_blocks * SAMPLES_PER_BLOCK, dtype=np.int64)
    for i in range(n_blocks):
        out[i * SAMPLES_PER_BLOCK : (i + 1) * SAMPLES_PER_BLOCK] = (
            adpcm_decode_block(payload[i * BLOCK_ALIGN : (i + 1) * BLOCK_ALIGN])
        )
    info = dict(fmt, n_samples=fact, n_blocks=n_blocks,
                compressed_bytes=len(payload))
    return info, out[:fact]
