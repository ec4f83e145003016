"""Real AVI (RIFF) container codec for Motion-JPEG video.

AVI is the RIFF-framed video container (public format: the RIFF chunk
grammar plus the `avih`/`strh`/`strf` headers and the `movi` payload
list, as documented in the published AVI 1.0 / OpenDML specs).  With
the in-repo baseline JPEG codec (llm/jpeg.py) this gives an honest,
end-to-end REAL video path: build a spec-valid MJPEG AVI any media
tool can probe, then parse the container and Huffman-decode every
frame — no ffmpeg, no stub.  H.264/HEVC/VP9 payloads still genuinely
require an external decoder; that remaining stub is documented at the
query layer (multimodal.py).

Layout notes (all little-endian, unlike ISO BMFF):
  RIFF('AVI ')
    LIST('hdrl')
      avih  — 56-byte main header (µs/frame, total frames, dims, …)
      LIST('strl')
        strh — 56-byte stream header (fccType 'vids', handler 'MJPG',
               scale/rate, length in frames)
        strf — 40-byte BITMAPINFOHEADER (biCompression 'MJPG')
    LIST('movi')
      00dc  — one chunk per frame, full JPEG bytes, word-aligned
    idx1    — 16-byte entries (chunk id, AVIIF_KEYFRAME, offset, size)

Reference parity: the reference toolkit has no media layer at all —
this module extends SURVEY.md §7's multimodal-column plan (binary
payload + typed metadata), mirroring how TechnicalMeta parses binary
cell payloads by fixed layout (meta/TechnicalMeta.java:138-150).
"""

from __future__ import annotations

import struct

_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def build_avi_mjpeg(
    width: int, height: int, frames: list[bytes], fps: int = 25
) -> bytes:
    """Assemble a structurally valid MJPEG AVI from encoded JPEG frames."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    if fps < 1:
        raise ValueError("fps must be >= 1")
    if not (1 <= width <= 65535 and 1 <= height <= 65535):
        raise ValueError("dimensions must fit the 16-bit rcFrame fields")
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
    if max_bytes * fps >= 1 << 32:
        raise ValueError("dwMaxBytesPerSec overflows 32 bits")
    avih = struct.pack(
        "<14I",
        us_per_frame,          # dwMicroSecPerFrame
        max_bytes * fps,       # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags (AVIF_HASINDEX)
        len(frames),           # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_bytes,             # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,            # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,                 # dwFlags
            0, 0,              # wPriority, wLanguage
            0,                 # dwInitialFrames
            1,                 # dwScale
            fps,               # dwRate (fps = rate/scale)
            0,                 # dwStart
            len(frames),       # dwLength in frames
            max_bytes,         # dwSuggestedBufferSize
            0xFFFFFFFF,        # dwQuality (driver default)
            0,                 # dwSampleSize (0: variable-size frames)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                    # biSize
        width,
        height,
        1,                     # biPlanes
        24,                    # biBitCount
        b"MJPG",               # biCompression
        width * height * 3,    # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    # Assemble movi as a list + running offset: repeated bytes +=
    # copies the whole accumulated buffer each frame (quadratic — the
    # same trap just fixed in jpeg.py's bit writer).
    movi_parts = []
    idx_entries = []
    off = 4  # idx1 offsets are relative to the 'movi' fourcc position
    for f in frames:
        idx_entries.append((off, len(f)))
        part = _chunk(b"00dc", f)
        movi_parts.append(part)
        off += len(part)
    movi = _list(b"movi", b"".join(movi_parts))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for each chunk in [pos, end)."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"chunk {fourcc!r} overruns container")
        yield fourcc, body, size
        pos = body + size + (size % 2)  # word alignment
    if pos < end:
        # 1-7 leftover bytes cannot hold a chunk header — a torn chunk,
        # not legal slack (the only over-end tolerance is the final
        # omitted pad byte, which lands pos == end + 1).
        raise ValueError(f"torn chunk header: {end - pos} trailing bytes")


def parse_avi(data: bytes) -> dict:
    """Parse an AVI container for real: validate the RIFF framing, read
    the main/stream headers, and extract every '00dc' frame payload.

    Returns dict(width, height, us_per_frame, total_frames, fps,
    handler, frames=[bytes, ...], n_index_entries).
    """
    if data[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    if len(data) < 12:
        raise ValueError("truncated RIFF header")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if 8 + riff_size > len(data):
        raise ValueError("RIFF size overruns buffer")
    if data[8:12] != b"AVI ":
        raise ValueError("RIFF is not an AVI")
    out = {"frames": [], "n_index_entries": 0}
    n_streams = 0

    def _movi_frames(pos: int, end: int) -> None:
        for fc2, b2, s2 in _walk(data, pos, end):
            if fc2 == b"LIST" and data[b2 : b2 + 4] == b"rec ":
                # standard interleaving wraps frame chunks in rec groups
                _movi_frames(b2 + 4, b2 + s2)
            elif fc2 in (b"00dc", b"00db"):  # stream 0: compressed / DIB
                out["frames"].append(data[b2 : b2 + s2])

    for fourcc, body, size in _walk(data, 12, 8 + riff_size):
        if fourcc == b"LIST":
            list_type = data[body : body + 4]
            if list_type == b"hdrl":
                for fc2, b2, s2 in _walk(data, body + 4, body + size):
                    if fc2 == b"avih":
                        if s2 < 56:
                            raise ValueError(
                                f"avih must be >= 56 bytes, got {s2}"
                            )
                        v = struct.unpack_from("<14I", data, b2)
                        out["us_per_frame"] = v[0]
                        out["total_frames"] = v[4]
                        out["width"], out["height"] = v[8], v[9]
                    elif fc2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                        for fc3, b3, s3 in _walk(data, b2 + 4, b2 + s2):
                            if fc3 != b"strh":
                                continue
                            if s3 < 56:
                                raise ValueError(
                                    f"strh must be >= 56 bytes, got {s3}"
                                )
                            n_streams += 1
                            if n_streams > 1:
                                continue  # audio/extra streams: ignored
                            # The FIRST stream must be the video stream
                            # (the '00dc' ids below assume stream 0).
                            if data[b3 : b3 + 4] != b"vids":
                                raise ValueError("first stream not video")
                            # latin-1: a fourcc is 4 arbitrary bytes,
                            # not guaranteed UTF-8
                            out["handler"] = data[b3 + 4 : b3 + 8].decode(
                                "latin-1"
                            )
                            scale, rate = struct.unpack_from(
                                "<II", data, b3 + 20
                            )
                            out["fps"] = rate // max(scale, 1)
            elif list_type == b"movi":
                _movi_frames(body + 4, body + size)
        elif fourcc == b"idx1":
            out["n_index_entries"] = size // 16
    if "width" not in out:
        raise ValueError("missing avih header")
    if "handler" not in out:
        raise ValueError("missing strh stream header")
    if len(out["frames"]) != out["total_frames"]:
        raise ValueError(
            f"frame count mismatch: movi has {len(out['frames'])}, "
            f"avih says {out['total_frames']}"
        )
    return out
