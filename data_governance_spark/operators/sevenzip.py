"""7z archive reader, pure Python over stdlib codecs, from the public
format specification (7zFormat.txt, distributed with the LZMA SDK /
p7zip — public domain).

Scope (stated): the shapes real 7z archives overwhelmingly use —
single-coder folders with Copy, LZMA1, LZMA2, bzip2, or deflate
payloads (LZMA1/LZMA2 decode through ``lzma.FORMAT_RAW`` with the
coder properties translated to stdlib filter specs), two-coder
BCJ/delta filter chains bound to LZMA1/LZMA2 (bind pairs translated
to a stdlib ``FORMAT_RAW`` filter-chain list — x86, ARM, ARM-Thumb,
SPARC, PowerPC, IA64, and delta; the dominant real-world chain
shapes, r13 brief #2), solid or per-file folders, substream
splitting, encoded (compressed) headers, empty files and
directories, and CRC verification at every layer that declares one
(next-header, folder, substream).  OUT of scope, each a NAMED typed
boundary so corpus triage can count it: chains stdlib liblzma cannot
express (ARM64/RISC-V filters, 3+ coders, filter-over-bzip2 —
``7z-chain``), AES-encrypted archives (``7z-aes``), and any other
coder id (``7z-coder-<hex>``).

Why a from-spec reader: no stdlib/py7zr/7z binary exists in this
environment, and `.7z` is a standing member-format gap in the archive
tier (r12 VERDICT "What's missing" #2).  The test suite follows the
repo's avro precedent — an independent WRITER twin transcribed from
the same public spec (``tests/test_sevenzip.py``), with the codec
layer (the hard part) delegated to stdlib ``lzma``/``bz2``/``zlib``
on both sides, hostile-bytes fuzz, and bomb caps enforced while
feeding the decompressor (``max_length``), never after.

Reference twin: none — training-data extension per SURVEY.md §6.
"""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib

__all__ = [
    "SevenZipError",
    "SevenZipParseError",
    "SevenZipBombError",
    "SevenZipUnsupportedError",
    "sevenzip_members",
]


class SevenZipError(ValueError):
    """Base for every typed 7z failure."""


class SevenZipParseError(SevenZipError):
    """Corrupt/truncated archive, CRC mismatch, malformed header."""


class SevenZipBombError(SevenZipError):
    """Declared or actual expansion over a cap."""


class SevenZipUnsupportedError(SevenZipError):
    """Valid archive using an out-of-scope feature; ``.feature`` names
    it (``7z-aes``, ``7z-chain``, ``7z-coder-<hex>``)."""

    def __init__(self, feature: str):
        super().__init__(f"unsupported 7z feature: {feature}")
        self.feature = feature


_MAGIC = b"7z\xbc\xaf\x27\x1c"
_MAX_HEADER = 16 * 1024 * 1024  # decoded header cap (names etc.)

# property ids (7zFormat.txt)
_K_END = 0x00
_K_HEADER = 0x01
_K_ARCHIVE_PROPS = 0x02
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZE = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17


class _Rd:
    """Byte cursor with the 7z variable-length NUMBER codec."""

    __slots__ = ("d", "p")

    def __init__(self, d: bytes):
        self.d = d
        self.p = 0

    def byte(self) -> int:
        if self.p >= len(self.d):
            raise SevenZipParseError("truncated header")
        b = self.d[self.p]
        self.p += 1
        return b

    def take(self, n: int) -> bytes:
        if n < 0 or self.p + n > len(self.d):
            raise SevenZipParseError("truncated header")
        out = self.d[self.p: self.p + n]
        self.p += n
        return out

    def num(self) -> int:
        """7z NUMBER: high bits of byte 0 say how many LE bytes
        follow; remaining low bits are the value's high part."""
        b0 = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if not (b0 & mask):
                return value | (b0 & (mask - 1)) << (8 * i)
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bits(self, n: int) -> list[bool]:
        out = []
        b = 0
        avail = 0
        for _ in range(n):
            if not avail:
                b = self.byte()
                avail = 8
            out.append(bool(b & 0x80))
            b = (b << 1) & 0xFF
            avail -= 1
        return out

    def bools(self, n: int) -> list[bool]:
        """Optional bit vector: allAreDefined byte then bits."""
        if self.byte():
            return [True] * n
        return self.bits(n)


# branch (BCJ/delta) filter coders stdlib liblzma can chain —
# 7zFormat.txt / lzma SDK Methods.txt ids
_BRANCH_FILTERS: dict[bytes, tuple[str, int]] = {
    b"\x03": ("delta", lzma.FILTER_DELTA),
    b"\x03\x03\x01\x03": ("bcj-x86", lzma.FILTER_X86),
    b"\x03\x03\x02\x05": ("bcj-ppc", lzma.FILTER_POWERPC),
    b"\x03\x03\x04\x01": ("bcj-ia64", lzma.FILTER_IA64),
    b"\x03\x03\x05\x01": ("bcj-arm", lzma.FILTER_ARM),
    b"\x03\x03\x07\x01": ("bcj-armt", lzma.FILTER_ARMTHUMB),
    b"\x03\x03\x08\x05": ("bcj-sparc", lzma.FILTER_SPARC),
}


def _lzma_filter_spec(coder_id: bytes, props: bytes) -> dict | None:
    """stdlib filter spec for an LZMA-family coder, else None."""
    if coder_id == b"\x21":  # LZMA2
        if len(props) != 1:
            raise SevenZipParseError("bad LZMA2 props")
        return {"id": lzma.FILTER_LZMA2,
                "dict_size": _lzma2_dict_size(props[0])}
    if coder_id == b"\x03\x01\x01":  # LZMA1
        if len(props) != 5:
            raise SevenZipParseError("bad LZMA1 props")
        d = props[0]
        if d >= 225:
            raise SevenZipParseError("bad LZMA1 lclppb")
        return {
            "id": lzma.FILTER_LZMA1,
            "lc": d % 9,
            "lp": (d // 9) % 5,
            "pb": d // 45,
            "dict_size": max(struct.unpack("<I", props[1:5])[0], 4096),
        }
    return None


def _branch_filter_spec(coder_id: bytes, props: bytes) -> dict | None:
    """stdlib filter spec for a branch (BCJ/delta) coder, else None."""
    hit = _BRANCH_FILTERS.get(coder_id)
    if hit is None:
        return None
    name, fid = hit
    if name == "delta":
        if len(props) != 1:
            raise SevenZipParseError("bad delta props")
        return {"id": fid, "dist": props[0] + 1}
    if not props:
        return {"id": fid}
    if len(props) == 4:
        return {"id": fid,
                "start_offset": struct.unpack("<I", props)[0]}
    raise SevenZipParseError(f"bad {name} props")


def _lzma_raw_decode(filters: list[dict], packed: bytes,
                     unpack_size: int) -> bytes:
    try:
        dec = lzma.LZMADecompressor(format=lzma.FORMAT_RAW,
                                    filters=filters)
        out = dec.decompress(packed, max_length=unpack_size)
    except (lzma.LZMAError, ValueError) as e:
        raise SevenZipParseError(f"bad LZMA folder: {e}") from None
    if len(out) < unpack_size:
        raise SevenZipParseError("LZMA folder shorter than declared")
    return out


def _decode_folder(folder: "_Folder", packed: bytes,
                   max_out: int) -> bytes:
    """One folder's final output, cap enforced WHILE feeding the
    decompressor.  Single coders and two-coder BCJ/delta-over-LZMA
    chains (stdlib raw filter lists) decode; anything else is a
    NAMED typed boundary."""
    unpack_size = folder.unpack_size
    if unpack_size > max_out:
        raise SevenZipBombError(
            f"folder declares {unpack_size} bytes"
        )
    if len(folder.coders) == 2:
        return _decode_chain(folder, packed, unpack_size)
    coder_id, props = folder.coders[0]
    return _decode_single(coder_id, props, packed, unpack_size)


def _decode_chain(folder: "_Folder", packed: bytes,
                  unpack_size: int) -> bytes:
    """Two-coder chain: the bind pair must feed the LZMA coder's
    output into a stdlib-expressible branch filter."""
    specs = [(cid, _branch_filter_spec(cid, pr), _lzma_filter_spec(cid, pr))
             for cid, pr in folder.coders]
    branch = [i for i, (_, b, _l) in enumerate(specs) if b is not None]
    compress = [i for i, (_, _b, l) in enumerate(specs) if l is not None]
    if len(branch) != 1 or len(compress) != 1:
        raise SevenZipUnsupportedError("7z-chain")
    bi, ci = branch[0], compress[0]
    # out-stream index i belongs to coder i (each coder here is
    # 1-in/1-out, enforced at parse); the single bind pair must route
    # the compressor's output into the branch filter's input
    if folder.bind_pairs != [(bi, ci)]:
        raise SevenZipUnsupportedError("7z-chain")
    return _lzma_raw_decode([specs[bi][1], specs[ci][2]],
                            packed, unpack_size)


def _decode_single(coder_id: bytes, props: bytes, packed: bytes,
                   unpack_size: int) -> bytes:
    if coder_id == b"\x00":  # Copy
        if len(packed) < unpack_size:
            raise SevenZipParseError("copy folder shorter than declared")
        return packed[:unpack_size]
    lz = _lzma_filter_spec(coder_id, props)
    if lz is not None:
        return _lzma_raw_decode([lz], packed, unpack_size)
    if coder_id == b"\x04\x02\x02":  # bzip2
        # cap enforced WHILE feeding, like the LZMA/deflate paths: a
        # one-shot bz2.decompress would materialize a bomb's full
        # output before the declared-size check ever ran (bzip2
        # expands up to ~1.4e6:1), so a lying unpack_size could OOM.
        try:
            dec = bz2.BZ2Decompressor()
            out = dec.decompress(packed, unpack_size)
        except (OSError, ValueError, EOFError) as e:
            raise SevenZipParseError(f"bad bzip2 folder: {e}") from None
        if len(out) < unpack_size:
            raise SevenZipParseError("bzip2 folder shorter than declared")
        return out
    elif coder_id == b"\x04\x01\x08":  # deflate
        try:
            out = zlib.decompressobj(wbits=-15).decompress(
                packed, unpack_size)
        except zlib.error as e:
            raise SevenZipParseError(f"bad deflate folder: {e}") from None
        if len(out) < unpack_size:
            raise SevenZipParseError(
                "deflate folder shorter than declared")
        return out
    elif coder_id[:1] == b"\x06":
        raise SevenZipUnsupportedError("7z-aes")
    raise SevenZipUnsupportedError(f"7z-coder-{coder_id.hex()}")


def _lzma2_dict_size(code: int) -> int:
    if code > 40:
        raise SevenZipParseError("bad LZMA2 dict-size code")
    if code == 40:
        return 0xFFFFFFFF
    return (2 | (code & 1)) << (code // 2 + 11)


class _Folder:
    __slots__ = ("coders", "bind_pairs", "unpack_size", "crc")

    def __init__(self):
        self.coders: list[tuple[bytes, bytes]] = []  # (id, props)
        self.bind_pairs: list[tuple[int, int]] = []  # (in, out) stream
        self.unpack_size = 0  # final (unbound) out stream's size
        self.crc = None


def _read_streams_info(r: _Rd):
    """-> (pack_pos, pack_sizes, folders, substreams) where substreams
    is (counts per folder, sizes flat, crcs flat-or-None)."""
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[_Folder] = []
    sub = None
    while True:
        pid = r.num()
        if pid == _K_END:
            break
        if pid == _K_PACK_INFO:
            pack_pos = r.num()
            n = r.num()
            if n > 1_000_000:
                raise SevenZipBombError(f"{n} pack streams")
            while True:
                sid = r.num()
                if sid == _K_END:
                    break
                if sid == _K_SIZE:
                    pack_sizes = [r.num() for _ in range(n)]
                elif sid == _K_CRC:
                    # pack CRCs unused (folder CRCs verify content)
                    defined = r.bools(n)
                    r.take(4 * sum(defined))
                else:
                    raise SevenZipParseError(
                        f"unexpected id {sid} in PackInfo")
        elif pid == _K_UNPACK_INFO:
            if r.num() != _K_FOLDER:
                raise SevenZipParseError("UnpackInfo without kFolder")
            nf = r.num()
            if nf > 1_000_000:
                raise SevenZipBombError(f"{nf} folders")
            if r.byte() != 0:
                raise SevenZipUnsupportedError("7z-external-folders")
            for _ in range(nf):
                folders.append(_read_folder(r))
            if r.num() != _K_UNPACK_SIZE:
                raise SevenZipParseError("missing kCodersUnpackSize")
            # one size per OUT stream (== per coder here: 1-in/1-out
            # enforced at parse); the folder's output is the out
            # stream no bind pair consumes
            for f in folders:
                outs = [r.num() for _ in f.coders]
                bound = {o for _, o in f.bind_pairs}
                final = [i for i in range(len(outs)) if i not in bound]
                if len(final) != 1:
                    raise SevenZipParseError(
                        "folder without a unique output stream")
                f.unpack_size = outs[final[0]]
            while True:
                sid = r.num()
                if sid == _K_END:
                    break
                if sid == _K_CRC:
                    defined = r.bools(nf)
                    for f, dfn in zip(folders, defined):
                        if dfn:
                            f.crc = struct.unpack("<I", r.take(4))[0]
                else:
                    raise SevenZipParseError(
                        f"unexpected id {sid} in UnpackInfo")
        elif pid == _K_SUBSTREAMS:
            sub = _read_substreams(r, folders)
        else:
            raise SevenZipParseError(f"unexpected id {pid} in StreamsInfo")
    return pack_pos, pack_sizes, folders, sub


def _read_folder(r: _Rd) -> _Folder:
    """Full folder parse per 7zFormat.txt: coders, bind pairs, packed
    -stream indices.  Every coder here must be 1-in/1-out (the only
    shapes liblzma chains express), each folder one packed stream —
    anything wider is the NAMED ``7z-chain`` boundary, but the parse
    itself must consume the exact bytes either way (a misparse would
    desync every later header field)."""
    f = _Folder()
    nc = r.num()
    if nc < 1 or nc > 64:
        raise SevenZipParseError(f"bad coder count {nc}")
    total_in = total_out = 0
    multi_inout = False
    for _ in range(nc):
        flags = r.byte()
        id_size = flags & 0x0F
        cid = r.take(id_size)
        nin = nout = 1
        if flags & 0x10:  # complex: explicit stream counts
            nin, nout = r.num(), r.num()
            if not (1 <= nin <= 64 and 1 <= nout <= 64):
                raise SevenZipParseError("bad coder stream counts")
            if nin != 1 or nout != 1:
                multi_inout = True
        total_in += nin
        total_out += nout
        props = b""
        if flags & 0x20:
            props = r.take(r.num())
        f.coders.append((cid, props))
    n_bind = total_out - 1
    if n_bind > total_in:
        raise SevenZipParseError("more bind pairs than in-streams")
    for _ in range(n_bind):
        f.bind_pairs.append((r.num(), r.num()))
    n_packed = total_in - n_bind
    if n_packed > 1:
        for _ in range(n_packed):
            r.num()  # packed-stream index
    if multi_inout or nc > 2 or n_packed != 1:
        raise SevenZipUnsupportedError("7z-chain")
    for inx, outx in f.bind_pairs:
        if not (0 <= inx < total_in and 0 <= outx < total_out):
            raise SevenZipParseError("bind pair out of range")
    return f


def _read_substreams(r: _Rd, folders: list[_Folder]):
    counts = [1] * len(folders)
    sizes: list[int] | None = None
    crcs: list[int | None] | None = None
    while True:
        sid = r.num()
        if sid == _K_END:
            break
        if sid == _K_NUM_UNPACK_STREAM:
            counts = [r.num() for _ in folders]
            if sum(counts) > 1_000_000:
                raise SevenZipBombError("substream count")
        elif sid == _K_SIZE:
            sizes = []
            for f, c in zip(folders, counts):
                tot = 0
                for i in range(c - 1):
                    s = r.num()
                    sizes.append(s)
                    tot += s
                if c:
                    if tot > f.unpack_size:
                        raise SevenZipParseError(
                            "substream sizes exceed folder")
                    sizes.append(f.unpack_size - tot)
        elif sid == _K_CRC:
            # digests for streams lacking a folder-level CRC; verified
            # per member in the emit loop (solid folders get no
            # folder-tier check, so this is their only integrity tier)
            n_need = sum(
                c for f, c in zip(folders, counts)
                if not (c == 1 and f.crc is not None)
            )
            defined = r.bools(n_need)
            need_crcs = [
                struct.unpack("<I", r.take(4))[0] if dfn else None
                for dfn in defined
            ]
            crcs = []
            it = iter(need_crcs)
            for f, c in zip(folders, counts):
                if c == 1 and f.crc is not None:
                    crcs.append(None)  # folder tier already covers it
                else:
                    crcs.extend(next(it) for _ in range(c))
        else:
            raise SevenZipParseError(
                f"unexpected id {sid} in SubStreamsInfo")
    if sizes is None:
        sizes = []
        for f, c in zip(folders, counts):
            if c == 1:
                sizes.append(f.unpack_size)
            elif c != 0:
                raise SevenZipParseError(
                    "substream counts without sizes")
    if crcs is None:
        crcs = [None] * len(sizes)
    elif len(crcs) != len(sizes):
        raise SevenZipParseError("substream CRC count mismatch")
    return counts, sizes, crcs


def sevenzip_members(
    data: bytes,
    max_member: int = 128 * 1024 * 1024,
    max_total: int = 256 * 1024 * 1024,
    max_members: int = 10_000,
) -> list[dict]:
    """All file members: ``(member, size, content, err)`` dicts —
    same row contract as :func:`operators.archives.archive_members`.
    Directories emit no rows; empty files emit ``b""`` rows.
    Archive-level failures raise typed; a folder that fails to decode
    quarantines ITS members per row and the rest of the archive
    survives."""
    if not isinstance(data, (bytes, bytearray)):
        raise SevenZipParseError(
            f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if data[:6] != _MAGIC:
        raise SevenZipParseError("not a 7z archive")
    if len(data) < 32:
        raise SevenZipParseError("truncated signature header")
    start_crc = struct.unpack("<I", data[8:12])[0]
    if zlib.crc32(data[12:32]) != start_crc:
        raise SevenZipParseError("signature header CRC mismatch")
    nh_off, nh_size, nh_crc = struct.unpack("<QQI", data[12:32])
    if nh_size > _MAX_HEADER:
        raise SevenZipBombError(f"header declares {nh_size} bytes")
    if 32 + nh_off + nh_size > len(data):
        raise SevenZipParseError("next header overruns input")
    hdr = data[32 + nh_off: 32 + nh_off + nh_size]
    if nh_size and zlib.crc32(hdr) != nh_crc:
        raise SevenZipParseError("next header CRC mismatch")
    if not hdr:
        return []
    r = _Rd(hdr)
    pid = r.num()
    if pid == _K_ENCODED_HEADER:
        # the header itself is a compressed folder: decode + reparse
        pack_pos, pack_sizes, folders, _ = _read_streams_info(r)
        if len(folders) != 1 or len(pack_sizes) != 1:
            raise SevenZipParseError("encoded header needs one folder")
        base = 32 + pack_pos
        packed = data[base: base + pack_sizes[0]]
        if len(packed) < pack_sizes[0]:
            raise SevenZipParseError("encoded header overruns input")
        f = folders[0]
        hdr = _decode_folder(f, packed, _MAX_HEADER)
        if f.crc is not None and zlib.crc32(hdr) != f.crc:
            raise SevenZipParseError("encoded header CRC mismatch")
        r = _Rd(hdr)
        pid = r.num()
    if pid != _K_HEADER:
        raise SevenZipParseError(f"expected kHeader, got {pid}")
    pack_pos = 0
    pack_sizes: list[int] = []
    folders: list[_Folder] = []
    sub = None
    names: list[str] = []
    empty_stream: list[bool] = []
    empty_file: list[bool] = []
    n_files = 0
    while True:
        pid = r.num()
        if pid == _K_END:
            break
        if pid == _K_ARCHIVE_PROPS:
            # (propertyType, size, data)* until kEnd — skip (spec
            # reserves it; no known property affects extraction)
            while True:
                pt = r.num()
                if pt == _K_END:
                    break
                r.take(r.num())
        elif pid == _K_MAIN_STREAMS:
            pack_pos, pack_sizes, folders, sub = _read_streams_info(r)
        elif pid == _K_FILES_INFO:
            n_files = r.num()
            if n_files > max_members:
                raise SevenZipBombError(f"{n_files} members")
            while True:
                ptype = r.num()
                if ptype == _K_END:
                    break
                size = r.num()
                body = _Rd(r.take(size))
                if ptype == _K_EMPTY_STREAM:
                    empty_stream = body.bits(n_files)
                elif ptype == _K_EMPTY_FILE:
                    # spec orders kEmptyStream first; sizing this
                    # vector off an unseen kEmptyStream would silently
                    # turn empty files into directories (dropped rows)
                    if not empty_stream:
                        raise SevenZipParseError(
                            "kEmptyFile before kEmptyStream")
                    empty_file = body.bits(sum(empty_stream))
                elif ptype == _K_NAME:
                    if body.byte():
                        raise SevenZipUnsupportedError(
                            "7z-external-names")
                    raw = body.d[body.p:]
                    names = [
                        s.decode("utf-16-le", errors="replace")
                        for s in _split_utf16(raw)
                    ]
                # all other properties (times, attributes, padding)
                # are skipped via their declared size
        else:
            raise SevenZipParseError(f"unexpected id {pid} in header")
    if not empty_stream:
        empty_stream = [False] * n_files
    if names and len(names) < n_files:
        raise SevenZipParseError("fewer names than files")
    counts, sizes, stream_crcs = sub if sub else (
        [1] * len(folders), [f.unpack_size for f in folders],
        [None] * len(folders))
    n_stream_files = n_files - sum(empty_stream)
    if sum(counts) != n_stream_files:
        raise SevenZipParseError(
            f"{sum(counts)} substreams for {n_stream_files} files")
    if sum(sizes) > max_total:
        raise SevenZipBombError(f"declares {sum(sizes)} bytes")

    # decode folders lazily, slice substreams, emit rows in file order
    out: list[dict] = []
    folder_idx = 0
    in_folder = 0  # substreams consumed in current folder
    folder_data: bytes | None = None
    folder_err: str | None = None
    folder_off = 0
    pack_off = 32 + pack_pos
    stream_i = 0
    empty_i = 0
    for fi in range(n_files):
        name = names[fi] if names else f"file{fi}"
        if empty_stream[fi]:
            is_file = empty_file[empty_i] if empty_i < len(empty_file) \
                else False
            empty_i += 1
            if is_file:
                out.append({"member": name, "size": 0, "content": b"",
                            "err": None})
            continue  # directories/anti-files: structure, not content
        # advance to the folder holding this substream
        while folder_idx < len(folders) and \
                in_folder >= counts[folder_idx]:
            folder_idx += 1
            in_folder = 0
            folder_data = None
            folder_err = None
            folder_off = 0
        if folder_idx >= len(folders):
            raise SevenZipParseError("substream without folder")
        if folder_data is None and folder_err is None:
            f = folders[folder_idx]
            psz = pack_sizes[folder_idx] \
                if folder_idx < len(pack_sizes) else 0
            base = pack_off + sum(pack_sizes[:folder_idx])
            packed = data[base: base + psz]
            if len(packed) < psz:
                folder_err = "SevenZipParseError"
            else:
                try:
                    folder_data = _decode_folder(f, packed, max_total)
                    if f.crc is not None and counts[folder_idx] == 1 \
                            and zlib.crc32(folder_data) != f.crc:
                        folder_data = None
                        folder_err = "SevenZipParseError"
                except SevenZipUnsupportedError as e:
                    folder_err = f"{type(e).__name__}:{e.feature}"
                except SevenZipError as e:
                    folder_err = type(e).__name__
        size = sizes[stream_i]
        stream_i += 1
        in_folder += 1
        if folder_err is not None:
            out.append({"member": name, "size": None, "content": None,
                        "err": folder_err})
            continue
        if size > max_member:
            out.append({"member": name, "size": None, "content": None,
                        "err": "SevenZipBombError"})
            folder_off += size
            continue
        body = folder_data[folder_off: folder_off + size]
        folder_off += size
        if len(body) < size:
            out.append({"member": name, "size": None, "content": None,
                        "err": "SevenZipParseError"})
            continue
        crc = stream_crcs[stream_i - 1]
        if crc is not None and zlib.crc32(body) != crc:
            out.append({"member": name, "size": None, "content": None,
                        "err": "SevenZipParseError"})
            continue
        out.append({"member": name, "size": size, "content": body,
                    "err": None})
    return out


def _split_utf16(raw: bytes) -> list[bytes]:
    """Split NUL-terminated UTF-16LE names; the blob must be exactly
    whole code units (a trailing odd byte is corruption, not slack)."""
    if len(raw) % 2:
        raise SevenZipParseError("odd-length names blob")
    out = []
    cur = bytearray()
    for i in range(0, len(raw) - 1, 2):
        pair = raw[i: i + 2]
        if pair == b"\x00\x00":
            out.append(bytes(cur))
            cur.clear()
        else:
            cur += pair
    if cur:
        raise SevenZipParseError("unterminated member name")
    return out
