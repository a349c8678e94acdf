"""Zstandard (RFC 8878) frame decoder, pure Python, from the public
specification — upgrades the archive tier's ``zstd`` boundary
(`.tar.zst` corpus dumps are the modern distribution default) into a
real format.

Why from-spec instead of a library: Python 3.11's stdlib has no zstd
(3.14 adds one), and the repo's byte-level tiers require (a) typed
errors for hostile bytes, (b) bomb caps enforced MID-STREAM — the
decoder checks the output budget block-by-block, which a one-shot
``decompress()`` binding cannot do without materializing the bomb
first — and (c) zero native dependencies in the executor hot path
beyond what the repo already ships.

Coverage (all of RFC 8878's mandatory decoder surface):

- frames: header variants (single-segment, all FCS widths, window
  descriptor), multi-frame concatenation, skippable frames, content
  checksum VERIFIED via a from-spec XXH64;
- blocks: Raw / RLE / Compressed, block-size ceiling
  (min(Window_Size, 128 KB)) enforced;
- literals: Raw / RLE / Huffman-compressed / Treeless (previous-table
  reuse), 1-stream and 4-stream (jump table) layouts, Huffman tree
  from direct 4-bit weights AND from FSE-compressed weights (two
  interleaved states);
- sequences: Predefined / RLE / FSE_Compressed / Repeat table modes
  for all three alphabets, full FSE table construction (low-prob
  ``-1`` symbols at high states, the spec's position-spread), the
  three-slot repeat-offset machinery incl. the ``litLength == 0``
  shift and the ``rep0 - 1`` case.

Typed boundaries (stated): dictionaries (``Dictionary_ID != 0``)
raise :class:`ZstdUnsupportedError` — dictionary-compressed members
are rare in corpus distribution and need the dictionary bytes anyway.

Tests (`tests/test_zstd.py`) pin the decoder against REAL zstd frames
produced by pyarrow's bundled libzstd (interop differential across
sizes/levels/shapes), against a from-spec test-suite encoder for the
paths real encoders rarely emit (RLE blocks/modes), against hostile
fuzz (never-raises-untyped), and against mid-stream bomb caps.

Reference twin: none — training-data extension per SURVEY.md §6 (the
format is RFC 8878, public).
"""

from __future__ import annotations

import os
import struct

__all__ = [
    "ZstdError",
    "ZstdParseError",
    "ZstdBombError",
    "ZstdUnsupportedError",
    "zstd_decompress",
    "zstd_decompress_auto",
    "xxh64",
]


class ZstdError(ValueError):
    """Base for every typed zstd failure."""


class ZstdParseError(ZstdError):
    """Corrupt/truncated frame, bad FSE/Huffman payload, checksum
    mismatch."""


class ZstdBombError(ZstdError):
    """Regenerated output exceeds the caller's cap (checked
    mid-stream, block by block)."""


class ZstdUnsupportedError(ZstdError):
    """Valid frame this build cannot decode (dictionaries)."""


_BLOCK_MAX = 128 * 1024
_MAGIC = 0xFD2FB528
_SKIP_MAGIC_MIN = 0x184D2A50
_SKIP_MAGIC_MAX = 0x184D2A5F

# ---------------------------------------------------------------------
# XXH64 (public xxHash spec) — for Content_Checksum verification
# ---------------------------------------------------------------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            v1, v2 = _round(v1, l1), _round(v2, l2)
            v3, v4 = _round(v3, l3), _round(v4, l4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ _round(0, k), 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ (k * _P1 & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5 & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------------
# bit readers
# ---------------------------------------------------------------------
class _BackBits:
    """zstd's backward bitstream: bytes are little-endian, reading
    starts after the sentinel (highest set bit of the LAST byte) and
    proceeds downward.  ``read`` past the start zero-pads and ``pos``
    goes negative — callers that require exactness check it.

    Implemented as a SLIDING cache refilled a byte at a time (a whole-
    stream big-int makes every read O(stream) — measured 10× slower on
    megabyte frames)."""

    __slots__ = ("data", "byte", "cache", "nbits", "pos")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ZstdParseError("bitstream has no sentinel bit")
        top = data[-1].bit_length() - 1
        self.data = data
        self.byte = len(data) - 1
        self.cache = data[-1] & ((1 << top) - 1)
        self.nbits = top
        self.pos = top + 8 * (len(data) - 1)

    def read(self, n: int) -> int:
        self.pos -= n
        data = self.data
        byte = self.byte
        cache = self.cache
        nbits = self.nbits
        while nbits < n and byte > 0:
            byte -= 1
            cache = (cache << 8) | data[byte]
            nbits += 8
        self.byte = byte
        if nbits >= n:
            nbits -= n
            out = cache >> nbits
            self.cache = cache & ((1 << nbits) - 1)
            self.nbits = nbits
            return out
        # zero-padded tail (legal for the final Huffman symbols)
        self.cache = 0
        self.nbits = 0
        return cache << (n - nbits)


class _FwdBits:
    """FSE table descriptions are read FORWARD, LSB-first."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        end = (self.bitpos + n + 7) // 8
        if end > len(self.data):
            raise ZstdParseError("FSE header overruns its payload")
        v = int.from_bytes(self.data[: end], "little")
        out = (v >> self.bitpos) & ((1 << n) - 1)
        self.bitpos += n
        return out

    def bytes_consumed(self) -> int:
        return (self.bitpos + 7) // 8


# ---------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------
def _fse_read_ncount(br: _FwdBits, max_symbol: int, max_log: int):
    """RFC 8878 §4.1.1: (accuracy_log, normalized counts with -1 for
    'less than one' probabilities)."""
    al = br.read(4) + 5
    if al > max_log:
        raise ZstdParseError(f"FSE accuracy log {al} > {max_log}")
    table_size = 1 << al
    remaining = table_size + 1
    threshold = table_size
    nbits = al + 1
    probs: list[int] = []
    prev0 = False
    while remaining > 1:
        if len(probs) > max_symbol:
            raise ZstdParseError("FSE counts exceed symbol alphabet")
        if prev0:
            # zero-repeat flags: 2 bits each, 3 == "three more zeros"
            while True:
                rep = br.read(2)
                probs.extend([0] * (3 if rep == 3 else rep))
                if len(probs) > max_symbol + 1:
                    raise ZstdParseError(
                        "FSE zero-run exceeds symbol alphabet"
                    )
                if rep != 3:
                    break
            prev0 = False
            continue
        maxv = (2 * threshold - 1) - remaining
        small = br.read(nbits - 1)
        if small < maxv:
            count = small
        else:
            extra = br.read(1)
            count = small + (extra << (nbits - 1))
            if count >= threshold:
                count -= maxv
        count -= 1  # -1 encodes the "less than one" probability
        remaining -= -count if count < 0 else count
        if remaining < 0:
            raise ZstdParseError("FSE counts exceed table size")
        probs.append(count)
        prev0 = count == 0
        while remaining < threshold and remaining > 1:
            nbits -= 1
            threshold >>= 1
    if len(probs) - 1 > max_symbol:
        raise ZstdParseError("FSE counts exceed symbol alphabet")
    return al, probs


def _fse_build_dtable(al: int, probs: list[int]):
    """Decode table: per state (symbol, nb_bits, baseline) — the
    spec's spread (step = 5/8 size + 3, low-probability symbols pinned
    to the highest states)."""
    size = 1 << al
    symbols = [0] * size
    high = size - 1
    counts = list(probs)
    for s, p in enumerate(probs):
        if p == -1:
            symbols[high] = s
            high -= 1
            counts[s] = 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(probs):
        for _ in range(max(p, 0)):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdParseError("FSE table spread did not close")
    nxt = list(counts)
    table = []
    for state in range(size):
        s = symbols[state]
        ns = nxt[s]
        nxt[s] += 1
        nb = al - (ns.bit_length() - 1)
        table.append((s, nb, (ns << nb) - size))
    return table


# predefined distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (6, [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                   2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                   -1, -1, -1, -1])
_ML_DEFAULT = (6, [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
                   -1, -1, -1, -1, -1])
_OF_DEFAULT = (5, [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                   1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1])

# baseline/extra-bits decode tables (RFC 8878 §3.1.1.3.2.1.1)
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]
_MAX_LL_SYM, _MAX_ML_SYM, _MAX_OF_SYM = 35, 52, 31
_MAX_LL_LOG, _MAX_ML_LOG, _MAX_OF_LOG = 9, 9, 8


# ---------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------
def _huf_table_from_weights(weights: list[int]):
    """(flat decode table, table_log): entry per table_log-bit prefix
    = (symbol, nb_bits).  The LAST weight is implied (completes the
    tree to a power of two); symbols fill the table lowest-weight
    (longest code) first, ascending symbol order within a weight."""
    if len(weights) < 1:
        raise ZstdParseError("huffman: no weights")
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdParseError("huffman: all-zero weights")
    table_log = total.bit_length()  # smallest 2^k > total
    rest = (1 << table_log) - total
    if rest & (rest - 1):
        raise ZstdParseError("huffman: weights do not complete a tree")
    last_weight = rest.bit_length()
    weights = weights + [last_weight]
    if table_log > 11:
        raise ZstdParseError(f"huffman: table log {table_log} > 11")
    if len(weights) > 256:
        raise ZstdParseError("huffman: > 256 symbols")
    table: list = [None] * (1 << table_log)
    pos = 0
    for w in range(1, table_log + 1):
        span = 1 << (w - 1)
        nb = table_log + 1 - w
        for sym, ws in enumerate(weights):
            if ws != w:
                continue
            for _ in range(span):
                table[pos] = (sym, nb)
                pos += 1
    if pos != len(table):
        raise ZstdParseError("huffman: table not fully populated")
    return table, table_log


def _huf_read_weights(data: bytes):
    """Huffman_Tree_Description -> (weights, bytes consumed)."""
    if not data:
        raise ZstdParseError("huffman: empty tree description")
    hb = data[0]
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) // 2
        if len(data) < 1 + nbytes:
            raise ZstdParseError("huffman: truncated direct weights")
        weights = []
        for i in range(n):
            b = data[1 + i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, 1 + nbytes
    # FSE-compressed weights: hb = compressed size
    if len(data) < 1 + hb:
        raise ZstdParseError("huffman: truncated FSE weights")
    payload = data[1: 1 + hb]
    fwd = _FwdBits(payload)
    al, probs = _fse_read_ncount(fwd, 255, 6)
    dtable = _fse_build_dtable(al, probs)
    stream = payload[fwd.bytes_consumed():]
    br = _BackBits(stream)
    # two interleaved states (RFC 8878 §4.2.1.3)
    s1 = br.read(al)
    s2 = br.read(al)
    if br.pos < 0:
        raise ZstdParseError("huffman: FSE weight stream too short")
    weights: list[int] = []
    while True:
        if len(weights) > 255:
            raise ZstdParseError("huffman: weight stream too long")
        sym, nb, base = dtable[s1]
        weights.append(sym)
        if br.pos < nb:  # s1 exhausted the stream: flush s2 and stop
            weights.append(dtable[s2][0])
            break
        s1 = base + br.read(nb)
        sym, nb, base = dtable[s2]
        weights.append(sym)
        if br.pos < nb:
            weights.append(dtable[s1][0])
            break
        s2 = base + br.read(nb)
    return weights, 1 + hb


def _huf_decode_stream(data: bytes, table, table_log: int,
                       n_out: int) -> bytearray:
    """Hot loop: peek table_log bits, consume entry.nb — inlined
    sliding-cache reads (method-call overhead measured ~3× here)."""
    if not data or data[-1] == 0:
        raise ZstdParseError("huffman: bitstream has no sentinel bit")
    top = data[-1].bit_length() - 1
    byte = len(data) - 1
    cache = data[-1] & ((1 << top) - 1)
    nbits = top
    pos = top + 8 * byte  # bits remaining (may go negative at tail)
    out = bytearray()
    append = out.append
    while len(out) < n_out:
        while nbits < table_log and byte > 0:
            byte -= 1
            cache = (cache << 8) | data[byte]
            nbits += 8
        if nbits >= table_log:
            idx = cache >> (nbits - table_log)
        else:
            if pos <= -table_log:
                raise ZstdParseError("huffman: bitstream exhausted early")
            idx = cache << (table_log - nbits)
        sym, nb = table[idx]
        pos -= nb
        if nbits >= nb:
            nbits -= nb
            cache &= (1 << nbits) - 1
        else:
            nbits = 0
            cache = 0
        append(sym)
    if pos != 0:
        # libzstd's BIT_endOfDStream contract: anything other than
        # exact consumption (leftover bits OR zero-padded overreads
        # that happened to land on n_out) is corruption
        raise ZstdParseError("huffman: bitstream not fully consumed")
    return out


# ---------------------------------------------------------------------
# literals + sequences
# ---------------------------------------------------------------------
def _decode_literals(block: bytes, prev_huf):
    """-> (literals, bytes_consumed, huf_state)."""
    if not block:
        raise ZstdParseError("empty compressed block")
    b0 = block[0]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            size, hdr = b0 >> 3, 1
        elif sf == 1:
            if len(block) < 2:
                raise ZstdParseError("truncated literals header")
            size, hdr = (b0 >> 4) + (block[1] << 4), 2
        else:
            if len(block) < 3:
                raise ZstdParseError("truncated literals header")
            size = (b0 >> 4) + (block[1] << 4) + (block[2] << 12)
            hdr = 3
        if size > _BLOCK_MAX:
            raise ZstdParseError("literals exceed block ceiling")
        if ltype == 0:
            if len(block) < hdr + size:
                raise ZstdParseError("truncated raw literals")
            return block[hdr: hdr + size], hdr + size, prev_huf
        if len(block) < hdr + 1:
            raise ZstdParseError("truncated RLE literal")
        return bytes([block[hdr]]) * size, hdr + 1, prev_huf
    # Compressed (2) / Treeless (3)
    widths = {0: (10, 3, 1), 1: (10, 3, 4), 2: (14, 4, 4),
              3: (18, 5, 4)}
    bits, hdr, streams = widths[sf]
    if len(block) < hdr:
        raise ZstdParseError("truncated literals header")
    v = int.from_bytes(block[:hdr], "little") >> 4
    regen = v & ((1 << bits) - 1)
    comp = (v >> bits) & ((1 << bits) - 1)
    if regen > _BLOCK_MAX:
        raise ZstdParseError("literals exceed block ceiling")
    if len(block) < hdr + comp:
        raise ZstdParseError("truncated literals payload")
    payload = block[hdr: hdr + comp]
    if ltype == 2:
        weights, used = _huf_read_weights(payload)
        table, tlog = _huf_table_from_weights(weights)
        payload = payload[used:]
    else:
        if prev_huf is None:
            raise ZstdParseError("treeless literals with no prior table")
        table, tlog = prev_huf
    if streams == 1:
        lit = _huf_decode_stream(payload, table, tlog, regen)
    else:
        if len(payload) < 6:
            raise ZstdParseError("truncated jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", payload, 0)
        rest = payload[6:]
        if s1 + s2 + s3 > len(rest):
            raise ZstdParseError("jump table overruns payload")
        part = (regen + 3) // 4
        sizes = [part, part, part, regen - 3 * part]
        if sizes[3] < 0:
            raise ZstdParseError("negative fourth-stream size")
        chunks = [rest[:s1], rest[s1: s1 + s2],
                  rest[s1 + s2: s1 + s2 + s3], rest[s1 + s2 + s3:]]
        lit = bytearray()
        for chunk, n in zip(chunks, sizes):
            lit += _huf_decode_stream(chunk, table, tlog, n)
    return bytes(lit), hdr + comp, (table, tlog)


def _read_seq_table(block: bytes, off: int, mode: int, max_sym: int,
                    max_log: int, default, prev):
    """-> (dtable_or_rle, new_offset, state_for_repeat)."""
    if mode == 0:
        al, probs = default
        return _fse_build_dtable(al, probs), off, None
    if mode == 1:
        if off >= len(block):
            raise ZstdParseError("truncated RLE table byte")
        sym = block[off]
        if sym > max_sym:
            raise ZstdParseError(f"RLE symbol {sym} out of range")
        return ("rle", sym), off + 1, None
    if mode == 2:
        fwd = _FwdBits(block[off:])
        al, probs = _fse_read_ncount(fwd, max_sym, max_log)
        return _fse_build_dtable(al, probs), off + fwd.bytes_consumed(), None
    if prev is None:
        raise ZstdParseError("Repeat table mode with no prior table")
    return prev, off, None


class _SeqState:
    __slots__ = ("table", "state")

    def __init__(self, table, br: _BackBits, al_of_table):
        self.table = table
        if table[0] == "rle":
            self.state = None
        else:
            self.state = br.read(al_of_table)

    def peek(self):
        if self.table[0] == "rle":
            return self.table[1], 0, 0
        return self.table[self.state]

    def update(self, br: _BackBits):
        if self.table[0] == "rle":
            return
        _, nb, base = self.table[self.state]
        self.state = base + br.read(nb)


def _table_log(table):
    if table[0] == "rle":
        return 0
    return (len(table)).bit_length() - 1


def _decode_sequences(block: bytes, off: int, literals: bytes,
                      out: bytearray, reps: list[int],
                      prev_tables: list, budget: int,
                      ceiling: int, frame_start: int,
                      window: int) -> None:
    """Decode + execute the sequences section onto ``out`` (in place);
    mutates ``reps`` and ``prev_tables`` (the cross-block Repeat
    state).  ``budget`` is the caller's bomb cap (ZstdBombError);
    ``ceiling`` is the block's legal regeneration bound
    (ZstdParseError — exceeding it is corruption, not a cap hit, and
    the distinction matters for quarantine triage)."""
    if off >= len(block):
        raise ZstdParseError("missing sequences section")
    b0 = block[off]
    if b0 == 0:
        nseq, off = 0, off + 1
    elif b0 < 128:
        nseq, off = b0, off + 1
    elif b0 < 255:
        if off + 2 > len(block):
            raise ZstdParseError("truncated sequence count")
        nseq, off = ((b0 - 128) << 8) + block[off + 1], off + 2
    else:
        if off + 3 > len(block):
            raise ZstdParseError("truncated sequence count")
        nseq = block[off + 1] + (block[off + 2] << 8) + 0x7F00
        off += 3
    if nseq == 0:
        if len(out) + len(literals) > ceiling:
            raise ZstdParseError("block regenerates past ceiling")
        if len(out) + len(literals) > budget:
            raise ZstdBombError("output exceeds cap")
        out += literals
        return
    if off >= len(block):
        raise ZstdParseError("missing compression modes byte")
    modes = block[off]
    off += 1
    if modes & 3:
        raise ZstdParseError("reserved sequence mode bits set")
    ll_t, off, _ = _read_seq_table(block, off, (modes >> 6) & 3,
                                   _MAX_LL_SYM, _MAX_LL_LOG,
                                   _LL_DEFAULT, prev_tables[0])
    of_t, off, _ = _read_seq_table(block, off, (modes >> 4) & 3,
                                   _MAX_OF_SYM, _MAX_OF_LOG,
                                   _OF_DEFAULT, prev_tables[1])
    ml_t, off, _ = _read_seq_table(block, off, (modes >> 2) & 3,
                                   _MAX_ML_SYM, _MAX_ML_LOG,
                                   _ML_DEFAULT, prev_tables[2])
    prev_tables[0], prev_tables[1], prev_tables[2] = ll_t, of_t, ml_t
    br = _BackBits(block[off:])
    ll_s = _SeqState(ll_t, br, _table_log(ll_t))
    of_s = _SeqState(of_t, br, _table_log(of_t))
    ml_s = _SeqState(ml_t, br, _table_log(ml_t))
    if br.pos < 0:
        raise ZstdParseError("sequence bitstream too short for states")
    lit_pos = 0
    for i in range(nseq):
        of_code = of_s.peek()[0]
        if of_code > 31:
            raise ZstdParseError("offset code out of range")
        of_val = (1 << of_code) + br.read(of_code)
        ml_code = ml_s.peek()[0]
        if ml_code > _MAX_ML_SYM:
            raise ZstdParseError("match-length code out of range")
        ml = _ML_BASE[ml_code] + br.read(_ML_BITS[ml_code])
        ll_code = ll_s.peek()[0]
        if ll_code > _MAX_LL_SYM:
            raise ZstdParseError("literal-length code out of range")
        ll = _LL_BASE[ll_code] + br.read(_LL_BITS[ll_code])
        if br.pos < 0:
            raise ZstdParseError("sequence bitstream exhausted")
        # repeat-offset resolution (RFC 8878 §3.1.1.5)
        if of_val > 3:
            offset = of_val - 3
            reps[2], reps[1], reps[0] = reps[1], reps[0], offset
        else:
            idx = of_val - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = reps[0]
            else:
                offset = reps[idx] if idx < 3 else reps[0] - 1
                if offset == 0:
                    raise ZstdParseError("repeat offset resolves to 0")
                if idx != 1:
                    reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_pos + ll > len(literals):
            raise ZstdParseError("sequence overruns literal buffer")
        if len(out) + ll + ml > ceiling:
            raise ZstdParseError("block regenerates past ceiling")
        if len(out) + ll + ml > budget:
            raise ZstdBombError("output exceeds cap")
        out += literals[lit_pos: lit_pos + ll]
        lit_pos += ll
        if offset > len(out) - frame_start:
            # frames are independent (RFC 8878): an offset reaching
            # into a PREVIOUS frame's bytes is corruption, not history
            raise ZstdParseError("match offset beyond frame start")
        if offset > window:
            raise ZstdParseError("match offset beyond window size")
        if offset >= ml:
            start = len(out) - offset
            out += out[start: start + ml]
        else:  # overlapping copy
            start = len(out) - offset
            for k in range(ml):
                out.append(out[start + k])
        if i != nseq - 1:
            ll_s.update(br)
            ml_s.update(br)
            of_s.update(br)
            if br.pos < 0:
                raise ZstdParseError("sequence bitstream exhausted")
    if br.pos != 0:
        # exact-consumption contract (libzstd BIT_endOfDStream): a
        # corrupt unchecked frame must raise, not decode plausibly
        raise ZstdParseError("sequence bitstream not fully consumed")
    if len(out) + len(literals) - lit_pos > ceiling:
        raise ZstdParseError("block regenerates past ceiling")
    if len(out) + len(literals) - lit_pos > budget:
        raise ZstdBombError("output exceeds cap")
    out += literals[lit_pos:]


# ---------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------
def zstd_decompress(data: bytes, max_out: int = 1 << 30) -> bytes:
    """All frames of ``data`` decompressed (zstd files may concatenate
    frames; skippable frames are skipped), with the output cap
    enforced block by block."""
    if not isinstance(data, (bytes, bytearray)):
        raise ZstdParseError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if not data:
        # a zero-byte file is a truncated download, not empty content
        # (an empty frame still carries magic + header + last block)
        raise ZstdParseError("empty input")
    out = bytearray()
    pos = 0
    while pos < len(data):
        if len(data) - pos < 4:
            raise ZstdParseError("truncated frame magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if _SKIP_MAGIC_MIN <= magic <= _SKIP_MAGIC_MAX:
            if len(data) - pos < 8:
                raise ZstdParseError("truncated skippable frame")
            (sz,) = struct.unpack_from("<I", data, pos + 4)
            if pos + 8 + sz > len(data):
                raise ZstdParseError("skippable frame overruns input")
            pos += 8 + sz
            continue
        if magic != _MAGIC:
            raise ZstdParseError(f"bad magic 0x{magic:08x}")
        pos = _decode_frame(data, pos + 4, out, max_out)
    return bytes(out)


def _decode_frame(data: bytes, pos: int, out: bytearray,
                  max_out: int) -> int:
    start_len = len(out)
    if pos >= len(data):
        raise ZstdParseError("truncated frame header")
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise ZstdParseError("reserved frame-header bit set")
    single = bool(fhd & 0x20)
    checksum = bool(fhd & 0x04)
    did_flag = fhd & 3
    fcs_flag = fhd >> 6
    window = None
    if not single:
        if pos >= len(data):
            raise ZstdParseError("truncated window descriptor")
        wd = data[pos]
        pos += 1
        base = 1 << (10 + (wd >> 3))
        window = base + (base >> 3) * (wd & 7)
    did_size = (0, 1, 2, 4)[did_flag]
    if did_size:
        if pos + did_size > len(data):
            raise ZstdParseError("truncated dictionary id")
        did = int.from_bytes(data[pos: pos + did_size], "little")
        pos += did_size
        if did:
            raise ZstdUnsupportedError(
                f"dictionary-compressed frame (dict id {did}) — "
                "dictionaries are out of scope (stated)"
            )
    fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_size:
        if pos + fcs_size > len(data):
            raise ZstdParseError("truncated frame content size")
        fcs = int.from_bytes(data[pos: pos + fcs_size], "little")
        if fcs_size == 2:
            fcs += 256
        pos += fcs_size
    if single:
        window = fcs if fcs is not None else 0
    block_max = min(window if window else _BLOCK_MAX, _BLOCK_MAX)
    if block_max == 0:
        block_max = _BLOCK_MAX  # empty-content single-segment frames
    huf_state = None
    reps = [1, 4, 8]
    prev_tables: list = [None, None, None]
    while True:
        if pos + 3 > len(data):
            raise ZstdParseError("truncated block header")
        bh = int.from_bytes(data[pos: pos + 3], "little")
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 3:
            raise ZstdParseError("reserved block type")
        if btype == 0:  # Raw
            if bsize > block_max:
                raise ZstdParseError("raw block exceeds ceiling")
            if pos + bsize > len(data):
                raise ZstdParseError("truncated raw block")
            if len(out) + bsize > max_out:
                raise ZstdBombError("output exceeds cap")
            out += data[pos: pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if bsize > block_max:
                raise ZstdParseError("RLE block exceeds ceiling")
            if pos >= len(data):
                raise ZstdParseError("truncated RLE block")
            if len(out) + bsize > max_out:
                raise ZstdBombError("output exceeds cap")
            out += bytes([data[pos]]) * bsize
            pos += 1
        else:  # Compressed
            if pos + bsize > len(data):
                raise ZstdParseError("truncated compressed block")
            block = data[pos: pos + bsize]
            pos += bsize
            before = len(out)
            literals, used, huf_state = _decode_literals(block, huf_state)
            _decode_sequences(block, used, literals, out, reps,
                              prev_tables, max_out,
                              before + block_max, start_len,
                              window if window else _BLOCK_MAX)
        if last:
            break
    content = bytes(out[start_len:])
    if fcs is not None and len(content) != fcs:
        raise ZstdParseError(
            f"content size {len(content)} != declared {fcs}"
        )
    if checksum:
        if pos + 4 > len(data):
            raise ZstdParseError("truncated content checksum")
        (want,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if xxh64(content) & 0xFFFFFFFF != want:
            raise ZstdParseError("content checksum mismatch")
    return pos


# ---------------------------------------------------------------------
# native fast path (r13 brief #3)
# ---------------------------------------------------------------------
_NATIVE_ENV = "DG_SPARK_ZSTD_NATIVE"
_native_cache: object = None  # None = unresolved, False = unavailable


def _native_codec():
    """pyarrow's bundled libzstd codec, or None.  The env kill switch
    ``DG_SPARK_ZSTD_NATIVE=0`` is re-read per call (cheap) so a job
    can force the from-spec path without reimporting; the codec
    import itself is resolved once."""
    if os.environ.get(_NATIVE_ENV, "1") == "0":
        return None
    global _native_cache
    if _native_cache is None:
        try:
            import pyarrow as pa

            _native_cache = pa.Codec("zstd")
        except Exception:
            _native_cache = False
    return _native_cache or None


def _first_frame_fcs(data: bytes) -> int | None:
    """Declared content size of the FIRST frame when it is a
    standard, dictionary-free frame that states one — the only shape
    the native fast path accepts.  None routes to the from-spec
    decoder (which owns every typed-error decision)."""
    if len(data) < 5:
        return None
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        return None  # skippable-first / garbage: from-spec handles
    fhd = data[4]
    if fhd & 0x08:
        return None
    single = bool(fhd & 0x20)
    did_flag = fhd & 3
    fcs_flag = fhd >> 6
    pos = 5 + (0 if single else 1)
    did_size = (0, 1, 2, 4)[did_flag]
    if did_size:
        if pos + did_size > len(data):
            return None
        if int.from_bytes(data[pos: pos + did_size], "little"):
            return None  # dict frame: the typed-boundary path
        pos += did_size
    fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
    if not fcs_size:
        return None
    if pos + fcs_size > len(data):
        return None
    fcs = int.from_bytes(data[pos: pos + fcs_size], "little")
    if fcs_size == 2:
        fcs += 256
    return fcs


def zstd_decompress_auto(data: bytes, max_out: int = 1 << 30) -> bytes:
    """:func:`zstd_decompress` with a native fast path when pyarrow's
    bundled libzstd is importable — the r13 verdict's measured
    pure-Python ceiling (21 MB/s decoded per core) is the difference
    between scan-speed and CPU-bound ingest if a corpus arrives mostly
    as ``.tar.zst``.

    Safety model (why the fast path cannot weaken the typed/bomb
    contracts):

    - native runs ONLY when the first frame declares its content size
      and it fits ``max_out``; allocation is exactly that declared
      size, never attacker-elastic (libzstd requires dst == total
      content, so a lying FCS, extra frames, or trailing bytes error
      out and fall through);
    - libzstd verifies XXH64 content checksums itself (differentially
      pinned in tests/test_zstd.py);
    - ANY native failure falls back to the from-spec decoder, which
      owns every typed-error decision — the error taxonomy a caller
      observes is identical on both paths (parity-tested).

    ``DG_SPARK_ZSTD_NATIVE=0`` forces the from-spec path everywhere.
    """
    codec = _native_codec()
    if codec is not None and isinstance(data, (bytes, bytearray)):
        data = bytes(data)
        fcs = _first_frame_fcs(data)
        if fcs is not None and fcs <= max_out:
            try:
                return bytes(codec.decompress(data,
                                              decompressed_size=fcs))
            except Exception:
                pass  # from-spec decides the typed outcome
    return zstd_decompress(data, max_out)
