"""LZ4 Frame (+ legacy frame, + raw block) decoder, pure Python, from
the public specifications — extends the archive tier to ``.lz4`` /
``.tar.lz4`` corpus dumps (the Hadoop/streaming ecosystems' fast
codec) the same way r13's ``zstd.py`` covered ``.tar.zst``.

Why from-spec instead of a library: no lz4 binding in this
environment's stdlib, and the byte-level tiers require (a) typed
errors for hostile bytes, (b) bomb caps enforced MID-STREAM — the
decoder checks the output budget sequence-by-sequence, which a
one-shot binding cannot do without materializing the bomb first —
and (c) zero new native dependencies in the executor hot path.

Coverage (the whole mandatory decoder surface of the LZ4 Frame
Format spec v1.6.x plus the block format spec):

- frames: magic ``04 22 4D 18``, FLG/BD descriptor with the XXH32
  header checksum VERIFIED, optional content size (verified against
  the decoded total), block checksums, content checksum, multi-frame
  concatenation, skippable frames (``5x 2A 4D 18``);
- blocks: compressed and uncompressed (high-bit) blocks under the
  declared Block_Maximum_Size; LINKED blocks (``Block_Indep = 0``)
  share the frame's 64 KB history window, independent blocks are
  barred from reaching before their own start (the zstd
  frame-independence rigor, enforced, not assumed);
- sequences: token nibbles, 255-run length extensions, 16-bit
  offsets, overlapping matches as per-spec pattern repetition;
- the LEGACY frame (``02 21 4C 18``, the original ``lz4`` CLI
  container: bare 8 MB-decoded blocks with 4-byte sizes, no
  checksums) — old corpus snapshots still carry it.

Typed boundaries (stated): ``Dictionary_ID`` frames raise
:class:`Lz4UnsupportedError` (``lz4-dict`` — external dictionary
bytes required), as does a frame declaring a future format version.

Native fast path: :func:`lz4_decompress_auto` mirrors
``zstd_decompress_auto`` — when pyarrow's bundled liblz4 is
importable AND the frame declares its content size within the cap,
decompression goes native (allocation pinned to the declared size);
any failure falls back to the from-spec decoder, which owns every
typed-error decision.  ``DG_SPARK_LZ4_NATIVE=0`` forces from-spec.

Tests (``tests/test_lz4.py``) pin the decoder against REAL lz4
frames produced by pyarrow's bundled liblz4 (interop differential
across sizes/shapes), pin the from-spec XXH32 against liblz4's own
header-checksum bytes AND by having liblz4 verify checksums this
module's test encoder emits, fuzz hostile mutations
(never-raises-untyped), and enforce the mid-stream bomb caps.

Reference twin: none — training-data extension per SURVEY.md §6 (the
formats are the public lz4 frame/block specifications).
"""

from __future__ import annotations

import os
import struct

__all__ = [
    "Lz4Error",
    "Lz4ParseError",
    "Lz4BombError",
    "Lz4UnsupportedError",
    "lz4_block_decompress",
    "lz4_decompress",
    "lz4_decompress_auto",
    "xxh32",
]


class Lz4Error(ValueError):
    """Base for every typed lz4 failure."""


class Lz4ParseError(Lz4Error):
    """Corrupt/truncated frame or block, checksum mismatch."""


class Lz4BombError(Lz4Error):
    """Decoded output exceeds the caller's cap (checked mid-stream,
    sequence by sequence)."""


class Lz4UnsupportedError(Lz4Error):
    """Valid frame this build cannot decode (dictionaries, future
    versions); ``.feature`` names it (``lz4-dict``/``lz4-version``)
    for structured triage — never sniff the message text."""

    def __init__(self, feature: str, msg: str | None = None):
        super().__init__(msg or f"unsupported lz4 feature: {feature}")
        self.feature = feature


_FRAME_MAGIC = 0x184D2204
_LEGACY_MAGIC = 0x184C2102
_SKIP_MAGIC_MIN = 0x184D2A50
_SKIP_MAGIC_MAX = 0x184D2A5F

# BD block-maximum-size codes (spec table); other codes are reserved
_BD_MAX = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}

_LEGACY_BLOCK_DECODED = 8 * 1024 * 1024  # fixed by the legacy format

# 64 KB: the format's maximum match distance (16-bit offsets), hence
# the inter-block history linked blocks may reach into
_WINDOW = 1 << 16

# ---------------------------------------------------------------------
# XXH32 (public xxHash spec) — header/block/content checksums
# ---------------------------------------------------------------------
_P1 = 0x9E3779B1
_P2 = 0x85EBCA77
_P3 = 0xC2B2AE3D
_P4 = 0x27D4EB2F
_P5 = 0x165667B1
_M32 = (1 << 32) - 1


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i + 16 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl32((v1 + l1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl32((v2 + l2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl32((v3 + l3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl32((v4 + l4 * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
             + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl32((h + k * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ---------------------------------------------------------------------
# block format
# ---------------------------------------------------------------------
def lz4_block_decompress(
    src: bytes,
    out: bytearray,
    floor: int,
    max_out: int,
) -> None:
    """Decode one raw LZ4 block from ``src``, APPENDING to ``out``.
    ``floor`` is the lowest ``out`` index a match may reach back to —
    the frame start for linked blocks, the block start for independent
    ones (and 0 for a bare block).  The cap is enforced BEFORE every
    literal append and match copy, so a lying length extension cannot
    materialize past ``max_out``."""
    n = len(src)
    i = 0
    while True:
        if i >= n:
            raise Lz4ParseError("block ends without a final literal run")
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise Lz4ParseError("truncated literal-length run")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if lit:
            if i + lit > n:
                raise Lz4ParseError("literal run past block end")
            if len(out) + lit > max_out:
                raise Lz4BombError("literals inflate past the cap")
            out += src[i : i + lit]
            i += lit
        if i == n:
            return  # last sequence: literals only, per spec
        if i + 2 > n:
            raise Lz4ParseError("truncated match offset")
        off = src[i] | (src[i + 1] << 8)
        i += 2
        if off == 0:
            raise Lz4ParseError("zero match offset")
        mlen = (token & 0xF) + 4
        if token & 0xF == 15:
            while True:
                if i >= n:
                    raise Lz4ParseError("truncated match-length run")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        pos = len(out)
        if off > pos - floor:
            raise Lz4ParseError(
                "match offset reaches before the block/frame history"
            )
        if pos + mlen > max_out:
            raise Lz4BombError("match inflates past the cap")
        if off >= mlen:
            out += out[pos - off : pos - off + mlen]
        else:
            # overlap: the offset-long pattern repeats (spec note);
            # build it in O(len) doublings instead of per byte
            pat = bytes(out[pos - off : pos])
            reps = -(-mlen // off)
            out += (pat * reps)[:mlen]


# ---------------------------------------------------------------------
# frame format
# ---------------------------------------------------------------------
def _u32(data: bytes, pos: int, what: str) -> int:
    if pos + 4 > len(data):
        raise Lz4ParseError(f"truncated {what}")
    return struct.unpack_from("<I", data, pos)[0]


def _decode_frame(
    data: bytes, pos: int, out: bytearray, max_out: int
) -> int:
    """One frame starting AFTER its magic; returns the next offset."""
    if pos + 2 > len(data):
        raise Lz4ParseError("truncated frame descriptor")
    flg = data[pos]
    bd = data[pos + 1]
    if flg >> 6 != 0b01:
        raise Lz4UnsupportedError(
            "lz4-version",
            f"lz4 frame version {flg >> 6} (this build reads version 01)",
        )
    if flg & 0x02:
        raise Lz4ParseError("reserved FLG bit set")
    indep = bool(flg & 0x20)
    block_cksum = bool(flg & 0x10)
    has_csize = bool(flg & 0x08)
    content_cksum = bool(flg & 0x04)
    has_dict = bool(flg & 0x01)
    if bd & 0x8F:
        raise Lz4ParseError("reserved BD bits set")
    bmax = _BD_MAX.get((bd >> 4) & 0x7)
    if bmax is None:
        raise Lz4ParseError(f"reserved block-maximum-size code {bd >> 4}")
    desc_end = pos + 2
    csize = None
    if has_csize:
        if desc_end + 8 > len(data):
            raise Lz4ParseError("truncated content-size field")
        csize = struct.unpack_from("<Q", data, desc_end)[0]
        desc_end += 8
    if has_dict:
        # the 4-byte Dictionary_ID is present but useless without the
        # dictionary bytes themselves — typed + named for triage
        raise Lz4UnsupportedError(
            "lz4-dict", "lz4 dictionary frame (external dict required)"
        )
    if desc_end >= len(data):
        raise Lz4ParseError("truncated header checksum")
    want_hc = data[desc_end]
    got_hc = (xxh32(data[pos:desc_end]) >> 8) & 0xFF
    if want_hc != got_hc:
        raise Lz4ParseError("frame descriptor checksum mismatch")
    pos = desc_end + 1
    if csize is not None and csize > max_out - len(out):
        raise Lz4BombError(f"frame declares {csize} bytes (cap)")
    origin = len(out)  # where THIS frame's content starts in out
    while True:
        bword = _u32(data, pos, "block size")
        pos += 4
        if bword == 0:
            break  # EndMark
        raw = bool(bword & 0x80000000)
        bsize = bword & 0x7FFFFFFF
        if bsize > bmax:
            raise Lz4ParseError(
                f"block size {bsize} over the declared maximum {bmax}"
            )
        if pos + bsize > len(data):
            raise Lz4ParseError("truncated block")
        block = data[pos : pos + bsize]
        pos += bsize
        if block_cksum:
            want = _u32(data, pos, "block checksum")
            pos += 4
            if xxh32(block) != want:
                raise Lz4ParseError("block checksum mismatch")
        if raw:
            if len(out) + bsize > max_out:
                raise Lz4BombError("uncompressed block past the cap")
            out += block
        else:
            # linked blocks reach into earlier blocks of the SAME
            # frame, but never more than the 64 KB the 16-bit offset
            # can express; independent blocks are barred from
            # reaching before their own start
            floor = (
                len(out) if indep else max(origin, len(out) - _WINDOW)
            )
            before = len(out)
            lz4_block_decompress(block, out, floor, max_out)
            if len(out) - before > bmax:
                raise Lz4ParseError(
                    "block decodes past the declared maximum size"
                )
    if content_cksum:
        want = _u32(data, pos, "content checksum")
        pos += 4
        if xxh32(bytes(out[origin:])) != want:
            raise Lz4ParseError("content checksum mismatch")
    if csize is not None and len(out) - origin != csize:
        raise Lz4ParseError(
            "content size field does not match the decoded length"
        )
    return pos


def lz4_decompress(data: bytes, max_out: int = 1 << 30) -> bytes:
    """All frames in ``data`` (modern, legacy, skippable) decoded and
    concatenated — mirrors :func:`zstd.zstd_decompress`.  Typed
    :class:`Lz4Error` subclasses on any malformation; output bounded
    by ``max_out`` mid-stream."""
    if not isinstance(data, (bytes, bytearray)):
        raise Lz4ParseError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if not data:
        raise Lz4ParseError("empty input")
    out = bytearray()
    pos = 0
    while pos < len(data):
        magic = _u32(data, pos, "frame magic")
        pos += 4
        if _SKIP_MAGIC_MIN <= magic <= _SKIP_MAGIC_MAX:
            size = _u32(data, pos, "skippable frame size")
            pos += 4
            if pos + size > len(data):
                raise Lz4ParseError("truncated skippable frame")
            pos += size
            continue
        if magic == _LEGACY_MAGIC:
            pos = _decode_legacy(data, pos, out, max_out)
            continue
        if magic != _FRAME_MAGIC:
            raise Lz4ParseError(f"bad frame magic 0x{magic:08x}")
        pos = _decode_frame(data, pos, out, max_out)
    return bytes(out)


def _decode_legacy(
    data: bytes, pos: int, out: bytearray, max_out: int
) -> int:
    """The original lz4 CLI container: ``[LE32 csize][block]`` runs,
    each block decoding to at most 8 MB, independently compressed, no
    checksums.  The stream ends at end-of-input or at the next frame
    magic (how the reference CLI detects concatenation)."""
    any_block = False
    while pos < len(data):
        if len(data) - pos >= 4:
            peek = struct.unpack_from("<I", data, pos)[0]
            if peek in (_FRAME_MAGIC, _LEGACY_MAGIC) or (
                _SKIP_MAGIC_MIN <= peek <= _SKIP_MAGIC_MAX
            ):
                break  # next frame
        csize = _u32(data, pos, "legacy block size")
        pos += 4
        if csize == 0 or csize > (_LEGACY_BLOCK_DECODED + (
                _LEGACY_BLOCK_DECODED // 255) + 16):
            raise Lz4ParseError(f"implausible legacy block size {csize}")
        if pos + csize > len(data):
            raise Lz4ParseError("truncated legacy block")
        before = len(out)
        try:
            lz4_block_decompress(
                data[pos : pos + csize], out, before,
                min(max_out, before + _LEGACY_BLOCK_DECODED),
            )
        except Lz4BombError:
            if before + _LEGACY_BLOCK_DECODED <= max_out:
                # the 8 MB legacy-block ceiling is a FORMAT limit, not
                # the caller's budget — a block past it is structurally
                # invalid, and bomb/parse triage must not conflate them
                raise Lz4ParseError(
                    "legacy block decodes past its 8 MB format limit"
                ) from None
            raise
        pos += csize
        any_block = True
    if not any_block:
        raise Lz4ParseError("legacy frame with no blocks")
    return pos


# ---------------------------------------------------------------------
# native fast path (mirrors zstd_decompress_auto)
# ---------------------------------------------------------------------
_NATIVE_ENV = "DG_SPARK_LZ4_NATIVE"


def _native_codec():
    """pyarrow's bundled liblz4 frame codec, or None.
    ``DG_SPARK_LZ4_NATIVE=0`` is re-read per call (cheap) so a job
    can force the from-spec path without re-importing."""
    if os.environ.get(_NATIVE_ENV, "1") == "0":
        return None
    try:
        import pyarrow as pa

        return pa.Codec("lz4")
    except Exception:
        return None


def _single_frame_csize(data: bytes) -> int | None:
    """The declared content size IFF ``data`` is exactly one modern
    frame that declares it (no concatenation, no trailing bytes, no
    dictionary) — the only shape the native one-shot call is safe
    for.  Walks block headers without decoding (O(#blocks))."""
    try:
        if len(data) < 7 or struct.unpack_from("<I", data)[0] != _FRAME_MAGIC:
            return None
        flg = data[4]
        if flg >> 6 != 0b01 or not flg & 0x08 or flg & 0x01:
            return None  # no content size / dictionary / bad version
        block_cksum = bool(flg & 0x10)
        content_cksum = bool(flg & 0x04)
        csize = struct.unpack_from("<Q", data, 6)[0]
        pos = 15  # magic 4 + FLG/BD 2 + csize 8 + HC 1
        while True:
            if pos + 4 > len(data):
                return None
            bword = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            if bword == 0:
                break
            pos += (bword & 0x7FFFFFFF) + (4 if block_cksum else 0)
        if content_cksum:
            pos += 4
        return csize if pos == len(data) else None
    except struct.error:
        return None


def lz4_decompress_auto(data: bytes, max_out: int = 1 << 30) -> bytes:
    """:func:`lz4_decompress` with a native fast path when pyarrow's
    bundled liblz4 is importable — same safety model as
    ``zstd_decompress_auto``: native runs ONLY when the input is a
    single frame declaring a content size within ``max_out``
    (allocation pinned, never attacker-elastic), liblz4 verifies the
    frame's own checksums, and ANY native failure falls back to the
    from-spec decoder, which owns every typed-error decision.
    ``DG_SPARK_LZ4_NATIVE=0`` forces the from-spec path everywhere."""
    codec = _native_codec()
    if codec is not None and isinstance(data, (bytes, bytearray)):
        data = bytes(data)
        csize = _single_frame_csize(data)
        if csize is not None and csize <= max_out:
            try:
                return bytes(
                    codec.decompress(data, decompressed_size=csize)
                )
            except Exception:
                pass  # from-spec decides the typed outcome
    return lz4_decompress(data, max_out)
