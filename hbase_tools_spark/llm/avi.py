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
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
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
    movi_body = b""
    idx_entries = []
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_body), len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)
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


def parse_avi(data: bytes) -> dict:
    """Parse an AVI container for real: validate the RIFF framing, read
    the main/stream headers, and extract every '00dc' frame payload.

    Returns dict(width, height, us_per_frame, total_frames, fps,
    handler, frames=[bytes, ...], n_index_entries).
    """
    if data[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if 8 + riff_size > len(data):
        raise ValueError("RIFF size overruns buffer")
    if data[8:12] != b"AVI ":
        raise ValueError("RIFF is not an AVI")
    out = {"frames": [], "n_index_entries": 0}
    for fourcc, body, size in _walk(data, 12, 8 + riff_size):
        if fourcc == b"LIST":
            list_type = data[body : body + 4]
            if list_type == b"hdrl":
                for fc2, b2, s2 in _walk(data, body + 4, body + size):
                    if fc2 == b"avih":
                        v = struct.unpack_from("<14I", data, b2)
                        out["us_per_frame"] = v[0]
                        out["total_frames"] = v[4]
                        out["width"], out["height"] = v[8], v[9]
                    elif fc2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                        for fc3, b3, s3 in _walk(data, b2 + 4, b2 + s2):
                            if fc3 == b"strh":
                                if data[b3 : b3 + 4] != b"vids":
                                    raise ValueError("first stream not video")
                                out["handler"] = data[b3 + 4 : b3 + 8].decode()
                                scale, rate = struct.unpack_from(
                                    "<II", data, b3 + 20
                                )
                                out["fps"] = rate // max(scale, 1)
            elif list_type == b"movi":
                for fc2, b2, s2 in _walk(data, body + 4, body + size):
                    if fc2 == b"00dc":
                        out["frames"].append(data[b2 : b2 + s2])
        elif fourcc == b"idx1":
            out["n_index_entries"] = size // 16
    if "width" not in out:
        raise ValueError("missing avih header")
    if len(out["frames"]) != out["total_frames"]:
        raise ValueError(
            f"frame count mismatch: movi has {len(out['frames'])}, "
            f"avih says {out['total_frames']}"
        )
    return out
