"""Byte-level rowkey functions (M5): the only true scalar UDFs the engine
needs (SURVEY.md §2.9) — everything else compiles to Column expressions.

Implemented as Arrow-batched pandas UDFs (the fast Python path); the
algorithms are pure byte manipulation re-derived from the reference's
observable behavior:

* X1 salted key (common/KeyGenerator.java:27-49): CRC32 of the UTF-8
  key gives 4 big-endian salt bytes; short keys (<4 bytes) get
  ``salt || key``; longer keys get ``salt || key[-2:] || key[-4:-2] ||
  key`` (the swapped 2+2 tail bytes spread lexicographically-adjacent
  keys across regions).
* X2 printable encoding (Bytes.toStringBinary): ASCII 32..126 kept,
  everything else rendered ``\\xNN``.
* X4 range midpoint (splitter/TableSplitter.java:95-112 /
  Bytes.split): keys as big-endian unsigned integers, empty end key
  defaults to 8 x 0xFF, midpoint = (start+end)/2 at the common padded
  width.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def salt_key_bytes(key: bytes) -> bytes:
    """X1 — deterministic salted-key layout (see module docstring)."""
    crc = zlib.crc32(key) & 0xFFFFFFFF
    salt = crc.to_bytes(4, "big")
    if len(key) < 4:
        return salt + key
    return salt + key[-2:] + key[-4:-2] + key


def to_string_binary(b: bytes) -> str:
    """X2 — HBase-style printable rendering of a byte key."""
    out = []
    for ch in b:
        if 32 <= ch <= 126 and ch != 92:  # printable, not backslash
            out.append(chr(ch))
        else:
            out.append(f"\\x{ch:02X}")
    return "".join(out)


def midpoint_key(start: bytes, end: bytes) -> bytes:
    """X4 — arithmetic midpoint of [start, end) as big-endian unsigned
    integers; empty end means 'unbounded' -> 8 x 0xFF."""
    if end == b"":
        end = b"\xff" * 8
    width = max(len(start), len(end), 1)
    a = int.from_bytes(start.ljust(width, b"\x00"), "big")
    b_ = int.from_bytes(end.ljust(width, b"\x00"), "big")
    mid = (a + b_) // 2
    return mid.to_bytes(width, "big")


@F.pandas_udf(StringType())
def salted_key_hex(keys: pd.Series) -> pd.Series:
    return keys.map(lambda s: salt_key_bytes(s.encode("utf-8")).hex())


@F.pandas_udf(StringType())
def salted_key_printable(keys: pd.Series) -> pd.Series:
    return keys.map(lambda s: to_string_binary(salt_key_bytes(s.encode("utf-8"))))


@F.pandas_udf(StringType())
def midpoint_key_hex(start: pd.Series, end: pd.Series) -> pd.Series:
    return pd.Series(
        [
            midpoint_key(s.encode("utf-8"), e.encode("utf-8")).hex()
            for s, e in zip(start, end)
        ]
    )
