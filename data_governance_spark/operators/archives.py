"""Archive explosion: one row per member of zip / tar / gzip / bzip2
/ xz bytes — the container step a crawl or corpus-distribution
pipeline runs before the per-document tiers (PDF, office, charset,
codecs) can see anything.

Same contracts as the sibling byte-level tiers:

- **Typed errors** (:class:`ArchiveError` subclasses) — hostile bytes
  quarantine, never raise untyped (fuzz-pinned).
- **Bomb caps** enforced on DECLARED sizes up front and RE-CHECKED
  during decompression (zip headers and gzip ISIZE are
  attacker-controlled): total ≤ 256 MB, member ≤ 128 MB, members
  ≤ 10k per archive.
- **Map-only Spark surface** (:func:`explode_archives`): Arrow-batched
  ``mapInPandas``, no shuffle, no driver state.  A 100 TB dump of
  tarballs fans out to (archive × member) rows at scan speed, and the
  per-document operators compose downstream.

Format ladder (magic-sniffed; extensions are never trusted as FINAL —
the one exception is brotli, which RFC 7932 defines with NO stream
signature at all, so a ``.br``/``.tbr`` filename passed via
``explode_archives(path_col=...)`` acts as a routing HINT whose parse
failure still falls back to this ladder):

- outer stream compression: gzip (``1F 8B``), bzip2 (``BZh``), xz
  (``FD 37 7A 58 5A 00``), zstd (``28 B5 2F FD``, via the from-spec
  RFC 8878 decoder in ``operators/zstd.py`` — r13), lz4
  (``04 22 4D 18`` frames, the ``02 21 4C 18`` legacy container, and
  leading skippable frames, via the from-spec decoder in
  ``operators/lz4.py`` — r14) — decompressed incrementally under the
  cap, then re-sniffed: a tar inside explodes as members, anything
  else is a single member (named by the gzip FNAME header when
  present).
- zip (``PK``): members enumerated via the central directory;
  per-member failures (traditional PKZIP encryption flag, bad CRC,
  unsupported method) are typed PER MEMBER — the archive and its
  other members survive.
- tar (ustar magic at offset 257, or a valid all-octal V7 header):
  regular-file members only (dirs/symlinks/devices are structure, not
  corpus content — skipped, counted in no row).

Nesting is intentionally NOT recursed: an archive member that is
itself an archive comes out as bytes, and the Spark-idiomatic way to
go deeper is to run :func:`explode_archives` again over that output —
one more map stage, no hidden recursion bombs.

Extended training-data scope (the reference ingests database records,
not crawled containers); formats are the public ZIP APPNOTE, POSIX
ustar, and RFC 1952 surfaces via the stdlib.
"""

from __future__ import annotations

import bz2
import io
import lzma
import struct
import tarfile
import zipfile
import zlib

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "ArchiveError",
    "ArchiveParseError",
    "ArchiveBombError",
    "ArchiveEncryptedError",
    "ArchiveUnsupportedError",
    "archive_format",
    "archive_members",
    "explode_archives",
]


class ArchiveError(ValueError):
    """Base for every typed archive failure."""


class ArchiveParseError(ArchiveError):
    """Not an archive / truncated / structurally broken."""


class ArchiveBombError(ArchiveError):
    """Decompression bomb: declared or actual expansion over a cap."""


class ArchiveEncryptedError(ArchiveError):
    """Encrypted member (traditional PKZIP flag or AES extra)."""


class ArchiveUnsupportedError(ArchiveError):
    """RECOGNIZED format this build cannot decode (rar, 7z,
    dictionary-compressed zstd) — distinct from
    :class:`ArchiveParseError` so corpus triage can count the format
    boundary instead of lumping it with garbage (mirrors the codec
    boundary in ``multimodal.py``).  ``.format`` names the detected
    container; the Spark surface surfaces it as
    ``ArchiveUnsupportedError:<format>`` in the ``err`` column.

    Why the boundary: rar is proprietary and 7z's container has no
    stdlib decoder (its LZMA payloads do, but the archive structure
    is its own spec); zstd DECODES as of r13 via the from-spec
    ``operators/zstd.py``, except dictionary-compressed frames
    (``zstd-dict``), which need the external dictionary bytes.
    Typed-and-named keeps the quarantine honest."""

    def __init__(self, fmt: str):
        super().__init__(f"unsupported archive format: {fmt}")
        self.format = fmt


_MAX_TOTAL = 256 * 1024 * 1024
_MAX_MEMBER = 128 * 1024 * 1024
_MAX_MEMBERS = 10_000

_GZIP_MAGIC = b"\x1f\x8b"
_BZ2_MAGIC = b"BZh"
_XZ_MAGIC = b"\xfd7zXZ\x00"

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"  # RFC 8878 — operators/zstd.py (r13)
_7Z_MAGIC = b"7z\xbc\xaf\x27\x1c"  # operators/sevenzip.py (r13)
_LZ4_MAGIC = b"\x04\x22\x4d\x18"   # lz4 frame — operators/lz4.py (r14)
_LZ4_LEGACY_MAGIC = b"\x02\x21\x4c\x18"  # original lz4 CLI container
_LZ4_SKIP_HI = b"\x2a\x4d\x18"     # skippable frame magic, bytes 1-3
_SNAPPY_MAGIC = b"\xff\x06\x00\x00sNaPpY"  # framed — operators/snappy.py

# recognized-but-undecodable container magics → ArchiveUnsupportedError
_UNSUPPORTED_MAGICS = (
    (b"Rar!\x1a\x07\x01\x00", "rar5"),   # RAR 5.0 (check before 4.x)
    (b"Rar!\x1a\x07\x00", "rar"),        # RAR 1.5–4.x
)


def archive_format(data: bytes) -> str:
    """``zip tar gzip bzip2 xz zstd lz4 snappy 7z`` or
    :class:`ArchiveParseError` / :class:`ArchiveUnsupportedError`
    (rar)."""
    if not isinstance(data, (bytes, bytearray)):
        raise ArchiveParseError(f"expected bytes, got {type(data).__name__}")
    data = bytes(data)
    if data[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        return "zip"
    if data[:2] == _GZIP_MAGIC:
        return "gzip"
    if data[:3] == _BZ2_MAGIC and len(data) > 4 and data[3:4].isdigit():
        return "bzip2"
    if data[:6] == _XZ_MAGIC:
        return "xz"
    if data[:4] == _ZSTD_MAGIC:
        return "zstd"
    if data[:6] == _7Z_MAGIC:
        return "7z"
    if data[:4] in (_LZ4_MAGIC, _LZ4_LEGACY_MAGIC) or (
        len(data) >= 4
        and data[1:4] == _LZ4_SKIP_HI
        and 0x50 <= data[0] <= 0x5F
    ):
        return "lz4"
    if data[:10] == _SNAPPY_MAGIC:
        return "snappy"
    if _is_tar(data):
        return "tar"
    for magic, fmt in _UNSUPPORTED_MAGICS:
        if data[: len(magic)] == magic:
            raise ArchiveUnsupportedError(fmt)
    raise ArchiveParseError("not a recognized archive")


def _is_tar(data: bytes) -> bool:
    if len(data) < 512:
        return False
    if data[257:262] == b"ustar":  # POSIX / GNU
        return True
    # V7 fallback: checksum field must verify (same rule tarfile uses)
    try:
        chksum = int(data[148:156].split(b"\0")[0].strip() or b"-1", 8)
    except ValueError:
        return False
    unsigned = sum(data[:148]) + sum(data[156:512]) + 8 * 0x20
    return chksum == unsigned and chksum > 0


def bounded_decompress(
    data: bytes,
    kind: str,
    max_out: int,
    bomb_error: type = None,  # type: ignore[assignment]
    parse_error: type = None,  # type: ignore[assignment]
    multi_member: bool = True,
) -> bytes:
    """SHARED incremental decompression with the cap enforced
    mid-stream — the one bomb/truncation discipline for the archive,
    office, and avro tiers (review finding: three parallel
    implementations had drifted; avro's lacked the truncation check).

    - ``multi_member=True`` (gzip/bzip2/xz FILES): RFC 1952 and the
      bzip2/xz container formats allow back-to-back members (pigz,
      bgzip, concatenated logs) — restart a fresh decompressor on
      ``unused_data`` so later members aren't silently dropped.
    - ``multi_member=False`` (avro BLOCKS): exactly one raw stream;
      trailing bytes after its end are corruption and raise.
    - a stream whose input ends before its end marker raises
      ``parse_error`` — a truncated download must not masquerade as a
      complete (smaller) payload."""
    bomb_error = bomb_error or ArchiveBombError
    parse_error = parse_error or ArchiveParseError

    def fresh():
        if kind == "gzip":
            return zlib.decompressobj(wbits=31)
        if kind == "deflate":
            return zlib.decompressobj(wbits=-15)
        if kind == "bzip2":
            return bz2.BZ2Decompressor()
        return lzma.LZMADecompressor()

    out = []
    total = 0
    src = bytes(data)
    try:
        while True:  # one iteration per MEMBER
            d = fresh()
            chunk = d.decompress(src, max_out + 1)
            while True:
                total += len(chunk)
                if total > max_out:
                    raise bomb_error(
                        f"{kind} stream inflates past the cap"
                    )
                out.append(chunk)
                if getattr(d, "eof", False) or (
                    not d.unconsumed_tail
                    if hasattr(d, "unconsumed_tail")
                    else d.needs_input
                ):
                    break
                more = (
                    d.unconsumed_tail
                    if hasattr(d, "unconsumed_tail")
                    else b""
                )
                chunk = d.decompress(more, max_out + 1)
            if not getattr(d, "eof", True):
                raise parse_error(f"truncated {kind} stream")
            rest = bytes(getattr(d, "unused_data", b""))
            if hasattr(d, "unconsumed_tail") and d.unconsumed_tail:
                rest = bytes(d.unconsumed_tail) + rest
            if not rest.strip(b"\x00"):
                break  # done (NUL padding after the last member is ok)
            if not multi_member:
                raise parse_error(
                    f"{kind} stream has trailing bytes"
                )
            src = rest
    except (zlib.error, OSError, EOFError, lzma.LZMAError, ValueError) as e:
        if isinstance(e, (bomb_error, parse_error)):
            raise
        raise parse_error(f"bad {kind} stream: {e}") from None
    return b"".join(out)


def _bounded_decompress(data: bytes, kind: str) -> bytes:
    if kind == "zstd":
        # native (pyarrow libzstd) fast path with the from-spec RFC
        # 8878 decoder (operators/zstd.py) as verifier and fallback:
        # typed errors and caps identical on both paths, kill switch
        # DG_SPARK_ZSTD_NATIVE=0 (r14; the r13 pure-Python tier
        # measured 21 MB/s/core — a real ceiling for .tar.zst corpora)
        from .zstd import (
            ZstdBombError,
            ZstdError,
            ZstdUnsupportedError,
            zstd_decompress_auto,
        )

        try:
            return zstd_decompress_auto(data, max_out=_MAX_MEMBER)
        except ZstdBombError as e:
            raise ArchiveBombError(str(e)) from None
        except ZstdUnsupportedError:
            # dictionary-compressed frame: typed + named for triage,
            # same boundary class as rar/7z
            raise ArchiveUnsupportedError("zstd-dict") from None
        except ZstdError as e:
            raise ArchiveParseError(f"bad zstd stream: {e}") from None
    if kind == "lz4":
        # same shape as zstd: from-spec decoder (operators/lz4.py)
        # with a native (pyarrow liblz4) fast path inside
        # lz4_decompress_auto; typed errors and caps identical
        from .lz4 import (
            Lz4BombError,
            Lz4Error,
            Lz4UnsupportedError,
            lz4_decompress_auto,
        )

        try:
            return lz4_decompress_auto(data, max_out=_MAX_MEMBER)
        except Lz4BombError as e:
            raise ArchiveBombError(str(e)) from None
        except Lz4UnsupportedError as e:
            # dictionary frame or future version: typed + named via
            # the structured .feature field (never message-sniffed)
            raise ArchiveUnsupportedError(e.feature) from None
        except Lz4Error as e:
            raise ArchiveParseError(f"bad lz4 stream: {e}") from None
    if kind == "brotli":
        # RFC 7932 from-spec decoder (operators/brotli.py, r14).  No
        # stream magic exists, so this kind is only ever reached via
        # the extension hint in explode_archives; typed errors and the
        # mid-stream cap follow the zstd/lz4 shape.
        from .brotli import (
            BrotliBombError,
            BrotliError,
            brotli_decompress_auto,
        )

        try:
            return brotli_decompress_auto(data, max_out=_MAX_MEMBER)
        except BrotliBombError as e:
            raise ArchiveBombError(str(e)) from None
        except BrotliError as e:
            raise ArchiveParseError(f"bad brotli stream: {e}") from None
    if kind == "snappy":
        # framed snappy (.sz): from-spec container with per-chunk
        # CRC32C (operators/snappy.py); raw chunks reuse avro's codec
        from .snappy import (
            SnappyBombError,
            SnappyError,
            SnappyUnsupportedError,
            snappy_frame_decompress,
        )

        try:
            return snappy_frame_decompress(data, max_out=_MAX_MEMBER)
        except SnappyBombError as e:
            raise ArchiveBombError(str(e)) from None
        except SnappyUnsupportedError as e:
            raise ArchiveUnsupportedError(e.feature) from None
        except SnappyError as e:
            raise ArchiveParseError(
                f"bad framed-snappy stream: {e}"
            ) from None
    return bounded_decompress(
        data, kind, _MAX_MEMBER,
        bomb_error=ArchiveBombError, parse_error=ArchiveParseError,
        multi_member=True,
    )


def _gzip_name(data: bytes) -> str | None:
    """FNAME from the gzip header (RFC 1952), if present."""
    if len(data) < 10 or data[:2] != _GZIP_MAGIC:
        return None
    flg = data[3]
    pos = 10
    if flg & 0x04:  # FEXTRA
        if len(data) < pos + 2:
            return None
        xlen = struct.unpack_from("<H", data, pos)[0]
        pos += 2 + xlen
    if flg & 0x08:  # FNAME
        end = data.find(b"\0", pos)
        if end == -1:
            return None
        return data[pos:end].decode("latin-1", errors="replace")
    return None


def _zip_members(data: bytes) -> list[dict]:
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except (zipfile.BadZipFile, OSError, EOFError, ValueError,
            NotImplementedError) as e:
        # NotImplementedError: zipfile rejects hostile version-needed
        # fields at CONSTRUCTION time, not just per-member
        raise ArchiveParseError(f"bad zip: {e}") from None
    with zf:
        # NOT ZipInfo.is_dir(): on Python 3.11 it does filename[-1] and
        # raises an untyped IndexError for a zero-length member filename
        # (hostile central directory; fixed upstream in 3.12).
        infos = [
            zi for zi in zf.infolist()
            if zi.filename and not zi.filename.endswith("/")
        ]
        if len(infos) > _MAX_MEMBERS:
            raise ArchiveBombError(f"{len(infos)} members")
        declared = sum(zi.file_size for zi in infos)
        if declared > _MAX_TOTAL or any(
            zi.file_size > _MAX_MEMBER for zi in infos
        ):
            raise ArchiveBombError(f"declares {declared} bytes")
        out = []
        for zi in infos:
            rec = {"member": zi.filename, "size": None, "content": None,
                   "err": None}
            if zi.flag_bits & 0x1:
                rec["err"] = "ArchiveEncryptedError"
                out.append(rec)
                continue
            try:
                with zf.open(zi) as fh:
                    body = fh.read(_MAX_MEMBER + 1)
                if len(body) > _MAX_MEMBER:
                    rec["err"] = "ArchiveBombError"
                else:
                    rec["size"] = len(body)
                    rec["content"] = body
            except (zipfile.BadZipFile, OSError, EOFError, ValueError,
                    NotImplementedError, RuntimeError) as e:
                # RuntimeError: zipfile's own encrypted-member signal;
                # NotImplementedError: unsupported compression method
                rec["err"] = (
                    "ArchiveEncryptedError"
                    if "password" in str(e).lower()
                    or isinstance(e, RuntimeError)
                    else "ArchiveParseError"
                )
            out.append(rec)
        return out


def _7z_members(data: bytes) -> list[dict]:
    """7z via the from-spec reader (operators/sevenzip.py, r13),
    error taxonomy mapped into this tier's: 7z-aes is semantically an
    encrypted archive (ArchiveEncryptedError); other unsupported
    features keep the named-boundary convention."""
    from .sevenzip import (
        SevenZipBombError,
        SevenZipError,
        SevenZipParseError,
        SevenZipUnsupportedError,
        sevenzip_members,
    )

    try:
        recs = sevenzip_members(
            data, max_member=_MAX_MEMBER, max_total=_MAX_TOTAL,
            max_members=_MAX_MEMBERS,
        )
    except SevenZipBombError as e:
        raise ArchiveBombError(str(e)) from None
    except SevenZipUnsupportedError as e:
        raise ArchiveUnsupportedError(f"7z:{e.feature}") from None
    except SevenZipError as e:
        raise ArchiveParseError(f"bad 7z: {e}") from None
    _ = (SevenZipParseError,)  # taxonomy mapped via the table below
    remap = {
        "SevenZipParseError": "ArchiveParseError",
        "SevenZipBombError": "ArchiveBombError",
        "SevenZipUnsupportedError:7z-aes": "ArchiveEncryptedError",
    }
    for r in recs:
        if r["err"]:
            e = remap.get(r["err"])
            if e is None and r["err"].startswith(
                    "SevenZipUnsupportedError:"):
                e = "ArchiveUnsupportedError:" + r["err"].split(":", 1)[1]
            r["err"] = e or r["err"]
    return recs


def _tar_members(data: bytes) -> list[dict]:
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
    except (tarfile.TarError, OSError, EOFError, ValueError) as e:
        raise ArchiveParseError(f"bad tar: {e}") from None
    out: list[dict] = []
    with tf:
        total = 0
        while True:
            try:
                ti = tf.next()
            except (tarfile.TarError, OSError, EOFError, ValueError):
                break  # truncated tail: keep what parsed
            if ti is None:
                break
            if len(out) >= _MAX_MEMBERS:
                raise ArchiveBombError(f"> {_MAX_MEMBERS} members")
            if not ti.isreg():
                continue  # dirs/links/devices: structure, not content
            rec = {"member": ti.name, "size": None, "content": None,
                   "err": None}
            if ti.size > _MAX_MEMBER:
                rec["err"] = "ArchiveBombError"
                out.append(rec)
                continue
            total += ti.size
            if total > _MAX_TOTAL:
                raise ArchiveBombError(f"archive exceeds {_MAX_TOTAL}")
            try:
                fh = tf.extractfile(ti)
                body = fh.read(_MAX_MEMBER + 1) if fh else b""
                if len(body) > _MAX_MEMBER:
                    rec["err"] = "ArchiveBombError"
                else:
                    rec["size"] = len(body)
                    rec["content"] = body
            except (tarfile.TarError, OSError, EOFError, ValueError):
                rec["err"] = "ArchiveParseError"
            out.append(rec)
    return out


def archive_members(data: bytes, kind: str | None = None) -> list[dict]:
    """All regular-file members of the archive bytes, one dict per
    member: ``(member, size, content, err)``.  Stream-compressed tars
    (.tar.gz/.tbz2/.txz) explode as members; a stream wrapping
    anything else is a single member named by the gzip FNAME header
    (or ``"-"``).  Archive-level failures raise typed; member-level
    failures are typed PER ROW.

    ``kind`` overrides the magic sniff — the ONLY caller-supplied
    kind is ``"brotli"`` (from :func:`explode_archives`' extension
    hint), because RFC 7932 defines NO stream signature, so a .br
    file cannot be sniffed.  The hint is still not trusted: a
    mis-labeled file fails brotli parse typed and the caller falls
    back to the magic ladder."""
    if kind is None:
        kind = archive_format(data)
    if kind == "zip":
        return _zip_members(data)
    if kind == "tar":
        return _tar_members(data)
    if kind == "7z":
        return _7z_members(data)
    inner = _bounded_decompress(bytes(data), kind)
    if _is_tar(inner):
        return _tar_members(inner)
    name = _gzip_name(bytes(data)) if kind == "gzip" else None
    return [
        {"member": name or "-", "size": len(inner), "content": inner,
         "err": None}
    ]


def explode_archives(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    path_col: str | None = None,
) -> DataFrame:
    """One row per archive member per document:
    ``(id_col, member, size, content, err)``.  A document whose bytes
    are NULL or fail archive-level keeps ONE row with NULL member and
    the typed error name in ``err`` (quarantine semantics — documents
    never vanish silently), mirroring
    :func:`operators.pdf.extract_pdf_images`.

    ``path_col`` (optional) supplies a filename used as a FORMAT HINT
    for the one format that defines no stream signature: a name
    ending ``.br``/``.tbr`` routes first to the RFC 7932 brotli
    decoder (operators/brotli.py).  The hint is never trusted as
    final — if the brotli parse fails, the bytes fall back to the
    magic-sniffed ladder, so a mis-labeled ``.br`` that is really
    gzip still explodes correctly."""
    import pyspark.sql.types as T

    id_field = docs.schema[id_col]
    schema = T.StructType(
        [
            id_field,
            T.StructField("member", T.StringType()),
            T.StructField("size", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("err", T.StringType()),
        ]
    )
    cols = ["member", "size", "content", "err"]

    def run(batches):
        for pdf_b in batches:
            rows: list[dict] = []
            paths = (
                pdf_b[path_col]
                if path_col is not None
                else [None] * len(pdf_b)
            )
            for did, c, pth in zip(pdf_b[id_col], pdf_b[content_col], paths):
                base = {id_col: did, **{k: None for k in cols}}
                if c is None:
                    base["err"] = "null-content"
                    rows.append(base)
                    continue
                try:
                    recs = None
                    if pth is not None and str(pth).lower().endswith(
                        (".br", ".tbr")
                    ):
                        try:
                            recs = archive_members(bytes(c), kind="brotli")
                        except ArchiveParseError:
                            recs = None  # hint wrong: magic fallback
                    if recs is None:
                        recs = archive_members(bytes(c))
                except ArchiveUnsupportedError as e:
                    # name the format so triage can count rar vs 7z
                    # vs zstd separately
                    base["err"] = f"{type(e).__name__}:{e.format}"
                    rows.append(base)
                    continue
                except ArchiveError as e:
                    base["err"] = type(e).__name__
                    rows.append(base)
                    continue
                if not recs:
                    rows.append(base)  # empty archive: one NULL row
                    continue
                for r in recs:
                    rows.append({id_col: did, **r})
            yield pd.DataFrame(rows, columns=[id_col, *cols])

    sel = [id_col, content_col] + ([path_col] if path_col else [])
    return docs.select(*sel).mapInPandas(run, schema)
