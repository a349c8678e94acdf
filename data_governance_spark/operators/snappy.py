"""Snappy framing format (``.sz`` streams), pure Python, from the
public specification (google/snappy framing_format.txt) — extends the
archive tier to framed snappy, the Hadoop/streaming ecosystems' other
fast container next to ``.lz4`` (r14) and ``.tar.zst`` (r13).

Layering: the RAW snappy block codec already lives with its first
consumer, ``sources/avro.py`` (avro's default wild codec frames bare
raw blocks), and is reused here via a lazy import — the same
direction-breaking lazy-import pattern avro itself uses for
``archives.bounded_decompress``.  This module adds what the raw codec
deliberately does not have: the chunked stream container with CRC32C
(Castagnoli) integrity, implemented from the spec and VERIFIED
per chunk.

Coverage (the whole mandatory decoder surface of framing_format.txt):

- the stream identifier chunk (``FF 06 00 00 sNaPpY``), required
  first and validated wherever it re-appears mid-stream (the spec's
  concatenation idiom);
- compressed (``00``) and uncompressed (``01``) data chunks, each
  carrying a MASKED CRC32C of the uncompressed bytes — verified, with
  the spec's 65 536-byte uncompressed-per-chunk ceiling enforced;
- padding (``FE``) and skippable (``80``–``FD``) chunks skipped;
  reserved UNskippable chunks (``02``–``7F``) typed + named
  (``snappy-chunk-<hex>``) so corpus triage can size the miss.

Bomb posture: the total output budget is checked chunk by chunk
(mid-stream), and each chunk's declared uncompressed size is capped
by the spec ceiling before any bytes materialize.

Tests (``tests/test_snappy.py``) pin CRC32C against the RFC 3720
check value, differential the RAW layer against pyarrow's bundled
snappy in BOTH directions (its compressor's output decodes here; this
repo's literal-only compressor decodes there), round-trip the framing
via the writer twin below, and fuzz hostile mutations
(never-raises-untyped).

Reference twin: none — training-data extension per SURVEY.md §6 (the
format is the public snappy framing specification).
"""

from __future__ import annotations

import struct

__all__ = [
    "SnappyError",
    "SnappyParseError",
    "SnappyBombError",
    "SnappyUnsupportedError",
    "crc32c",
    "snappy_frame_compress",
    "snappy_frame_decompress",
]


class SnappyError(ValueError):
    """Base for every typed framed-snappy failure."""


class SnappyParseError(SnappyError):
    """Corrupt/truncated stream, bad chunk, CRC mismatch."""


class SnappyBombError(SnappyError):
    """Decoded output exceeds the caller's cap (checked chunk by
    chunk)."""


class SnappyUnsupportedError(SnappyError):
    """Valid stream with a reserved UNskippable chunk type this build
    cannot decode; ``.feature`` names it (``snappy-chunk-<hex>``)."""

    def __init__(self, feature: str):
        super().__init__(f"unsupported framed-snappy feature: {feature}")
        self.feature = feature


STREAM_ID = b"\xff\x06\x00\x00sNaPpY"

# framing_format.txt: "the uncompressed data in a chunk must be no
# longer than 65536 bytes"
_CHUNK_UNCOMP_MAX = 65536


# ---------------------------------------------------------------------
# CRC32C (Castagnoli) — table-driven from the reflected polynomial,
# plus the framing format's mask (rotate-right-15 + magic constant)
# that guards against CRCs of CRC-bearing data
# ---------------------------------------------------------------------
def _crc32c_table() -> list[int]:
    poly = 0x82F63B78  # reflected Castagnoli polynomial
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _mask(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------
def _raw_decompress(payload: bytes, max_out: int) -> bytes:
    # the raw block codec lives with its first consumer (module doc);
    # its AvroError taxonomy maps onto this tier's parse class
    from data_governance_spark.sources.avro import (
        AvroError,
        snappy_decompress,
    )

    try:
        return snappy_decompress(payload, max_out=max_out)
    except AvroError as e:
        raise SnappyParseError(str(e)) from None


def snappy_frame_decompress(data: bytes, max_out: int = 1 << 30) -> bytes:
    """All data chunks of a framed snappy stream, decoded, CRC32C
    verified, and concatenated.  Typed :class:`SnappyError` subclasses
    on any malformation; output bounded by ``max_out`` mid-stream."""
    if not isinstance(data, (bytes, bytearray)):
        raise SnappyParseError(
            f"expected bytes, got {type(data).__name__}"
        )
    data = bytes(data)
    if data[: len(STREAM_ID)] != STREAM_ID:
        raise SnappyParseError("missing stream identifier chunk")
    out = bytearray()
    pos = len(STREAM_ID)
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise SnappyParseError("truncated chunk header")
        ctype = data[pos]
        clen = int.from_bytes(data[pos + 1 : pos + 4], "little")
        pos += 4
        if pos + clen > n:
            raise SnappyParseError("truncated chunk body")
        body = data[pos : pos + clen]
        pos += clen
        if ctype == 0xFF:
            # a re-appearing stream identifier (stream concatenation):
            # contents are fixed by the spec and must validate
            if body != STREAM_ID[4:]:
                raise SnappyParseError("bad repeated stream identifier")
            continue
        if ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            continue  # padding / skippable
        if 0x02 <= ctype <= 0x7F:
            raise SnappyUnsupportedError(f"snappy-chunk-{ctype:02x}")
        if clen < 4:
            raise SnappyParseError("data chunk shorter than its CRC")
        want = struct.unpack_from("<I", body)[0]
        payload = body[4:]
        if ctype == 0x01:  # uncompressed
            chunk_out = payload
        else:  # 0x00 compressed — raw decode is bounded by the spec's
            # per-chunk ceiling (a lying preamble is a framing
            # violation, typed parse); the CALLER cap is re-checked on
            # the total below, so transient memory is ceiling-bounded
            chunk_out = _raw_decompress(payload, _CHUNK_UNCOMP_MAX)
        if len(chunk_out) > _CHUNK_UNCOMP_MAX:
            raise SnappyParseError(
                "chunk decodes past the 65536-byte framing ceiling"
            )
        if len(out) + len(chunk_out) > max_out:
            raise SnappyBombError("stream inflates past the cap")
        if _mask(crc32c(chunk_out)) != want:
            raise SnappyParseError("chunk CRC32C mismatch")
        out += chunk_out
    return bytes(out)


# ---------------------------------------------------------------------
# writer twin (deterministic — gate payloads pin its bytes)
# ---------------------------------------------------------------------
def snappy_frame_compress(
    data: bytes, chunk: int = _CHUNK_UNCOMP_MAX, compress: bool = True
) -> bytes:
    """Framed snappy writer: the stream identifier plus one data chunk
    per ``chunk`` bytes.  ``compress=True`` uses the repo's raw
    literal-only encoder (spec-legal everywhere); ``False`` emits
    uncompressed chunks.  Deterministic byte-for-byte — the q43 gate
    payload is pinned against it."""
    from data_governance_spark.sources.avro import snappy_compress

    if not 0 < chunk <= _CHUNK_UNCOMP_MAX:
        raise SnappyParseError(
            f"chunk size {chunk} outside (0, {_CHUNK_UNCOMP_MAX}]"
        )
    out = bytearray(STREAM_ID)
    data = bytes(data)
    for i in range(0, len(data), chunk):
        piece = data[i : i + chunk]
        crc = struct.pack("<I", _mask(crc32c(piece)))
        if compress:
            # always a 0x00 chunk: the literal-only raw encoder never
            # shrinks its input, and decoders must accept compressed
            # chunks regardless — this is what pins the compressed
            # path in-gate
            enc = snappy_compress(piece)
            out.append(0x00)
            out += len(crc + enc).to_bytes(3, "little") + crc + enc
        else:
            out.append(0x01)
            out += len(crc + piece).to_bytes(3, "little") + crc + piece
    return bytes(out)
