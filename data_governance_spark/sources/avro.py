"""Avro Object Container Files as a Spark source — pure stdlib.

Avro is the remaining mainstream interchange format this engine's
source tier didn't read (parquet/ORC are native, JSONL/CSV/XML/WARC
are implemented).  Spark's own reader lives in an external package
(``spark-avro``) that is not in this environment, so the container
format (public Apache Avro 1.11 spec) is implemented directly:

- container framing: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker,
  then blocks of ``(row count, byte size, payload, sync)``;
- codecs: ``null``, ``deflate`` (raw zlib), ``bzip2``, ``xz`` (the
  stdlib set) AND ``snappy`` — the wild's default, implemented from
  the public raw-block format spec (see :func:`snappy_decompress`)
  with avro's per-block big-endian CRC32 of the uncompressed bytes;
  ``zstd`` via the from-spec RFC 8878 decoder (``operators/zstd.py``,
  native fast path included — closed in r14; the boundary predated
  that module);
- binary decoding: zigzag varints, IEEE float/double LE,
  length-prefixed bytes/strings, records, enums, fixed, arrays and
  maps (incl. negative block counts with byte sizes), unions;
- schema → Spark type mapping with the ``["null", T]`` union
  idiom becoming a nullable ``T``.

Distribution model: **file-level parallelism** (:func:`read_avro`) —
files are listed by Spark's ``binaryFile`` source and each file
decodes inside one Arrow-batched ``mapInPandas`` task.  That is the
right shape for the many-files layout every Avro producer (Kafka
Connect, Sqoop, Flume) emits.  For the OTHER layout — few huge files
(dumped DB exports) — :func:`read_avro_split` (r14) tiles each file
into byte ranges and decodes blocks by sync-marker alignment with
Hadoop input-split ownership semantics (:func:`avro_rows_range`),
closing what was previously a stated boundary.

Bounds: per-block declared size and row count are capped, blocks
decompress under the cap incrementally, and every structural lie
raises :class:`AvroError` — the same hostile-input contract as the
office/archive tiers.
"""

from __future__ import annotations

import bz2
import io
import json
import lzma
import struct
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["AvroError", "avro_rows", "avro_rows_range", "avro_schema",
           "read_avro", "read_avro_split", "write_avro",
           "avro_to_spark_type", "snappy_compress", "snappy_decompress",
           "spark_to_avro_schema", "avro_shards", "write_avro_files"]

_MAGIC = b"Obj\x01"
_MAX_BLOCK_BYTES = 256 * 1024 * 1024
_MAX_BLOCK_ROWS = 10_000_000
_MAX_DEPTH = 64


class AvroError(ValueError):
    """Typed failure for any malformed/unsupported Avro input."""


class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.i = 0

    def need(self, n: int) -> bytes:
        if n < 0:
            # a hostile schema (e.g. fixed size -1) would otherwise
            # move the cursor BACKWARD and loop forever (review repro)
            raise AvroError(f"negative read of {n} bytes")
        if self.i + n > len(self.b):
            raise AvroError("truncated avro data")
        out = self.b[self.i : self.i + n]
        self.i += n
        return out

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.need(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise AvroError("varint overflow")
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def bytes_(self) -> bytes:
        n = self.long()
        if n < 0:
            raise AvroError(f"negative byte length {n}")
        return self.need(n)

    def string(self) -> str:
        return self.bytes_().decode("utf-8", errors="replace")


def _decode(r: _Reader, schema, depth: int = 0):
    if depth > _MAX_DEPTH:
        raise AvroError("schema recursion too deep")
    if isinstance(schema, list):  # union: index picks the branch
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode(r, schema[idx], depth + 1)
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            return {
                f["name"]: _decode(r, f["type"], depth + 1)
                for f in schema.get("fields", [])
            }
        if t == "enum":
            idx = r.long()
            syms = schema.get("symbols", [])
            if not 0 <= idx < len(syms):
                raise AvroError(f"enum index {idx} out of range")
            return syms[idx]
        if t == "array":
            out = []
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:  # block with byte size (skippable form)
                    n = -n
                    r.long()  # byte size — unused when decoding fully
                if n > _MAX_BLOCK_ROWS:
                    raise AvroError(f"array block of {n} items")
                for _ in range(n):
                    out.append(_decode(r, schema["items"], depth + 1))
            return out
        if t == "map":
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    r.long()
                if n > _MAX_BLOCK_ROWS:
                    raise AvroError(f"map block of {n} items")
                for _ in range(n):
                    k = r.string()
                    out[k] = _decode(r, schema["values"], depth + 1)
            return out
        if t == "fixed":
            size = int(schema["size"])
            if not 0 <= size <= _MAX_BLOCK_BYTES:
                raise AvroError(f"bad fixed size {size}")
            return r.need(size)
        # {"type": "string", "logicalType": ...} etc. — unwrap
        return _decode(r, t, depth + 1)
    if schema == "null":
        return None
    if schema == "boolean":
        return r.need(1) != b"\x00"
    if schema in ("int", "long"):
        return r.long()
    if schema == "float":
        return struct.unpack("<f", r.need(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.need(8))[0]
    if schema == "bytes":
        return r.bytes_()
    if schema == "string":
        return r.string()
    raise AvroError(f"unsupported avro type {schema!r}")


def _decompress(payload: bytes, codec: str) -> bytes:
    if codec in ("", "null"):
        return payload
    if codec == "snappy":
        # avro frames snappy blocks as snappy(raw) + 4-byte
        # BIG-endian CRC32 of the UNCOMPRESSED bytes
        if len(payload) < 4:
            raise AvroError("snappy block too short for its CRC")
        out = snappy_decompress(payload[:-4])
        want = int.from_bytes(payload[-4:], "big")
        if zlib.crc32(out) != want:
            raise AvroError("snappy block CRC mismatch")
        return out
    if codec == "zstd":
        # one RFC 8878 stream per block, via the from-spec decoder
        # (operators/zstd.py, r13 — this boundary predates it); caps
        # and typed errors mapped into this tier's taxonomy
        from data_governance_spark.operators.zstd import (
            ZstdError,
            zstd_decompress_auto,
        )

        try:
            return zstd_decompress_auto(payload, max_out=_MAX_BLOCK_BYTES)
        except ZstdError as e:
            raise AvroError(f"bad zstd block: {e}") from None
    if codec not in ("deflate", "bzip2", "xz"):
        raise AvroError(f"unsupported avro codec {codec!r}")
    # the SHARED bounded-decompress discipline (archives.py): caps
    # enforced mid-stream, truncation typed, and — because an avro
    # block is exactly ONE raw stream — trailing bytes typed too
    from data_governance_spark.operators.archives import (
        bounded_decompress,
    )

    return bounded_decompress(
        payload, codec, _MAX_BLOCK_BYTES,
        bomb_error=AvroError, parse_error=AvroError,
        multi_member=False,
    )


def _header(r: _Reader) -> tuple[dict, str, bytes]:
    if r.need(4) != _MAGIC:
        raise AvroError("not an avro container (bad magic)")
    meta: dict = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        if n > 10_000:
            raise AvroError("metadata block too large")
        for _ in range(n):
            k = r.string()
            meta[k] = r.bytes_()
    sync = r.need(16)
    raw_schema = meta.get("avro.schema")
    if raw_schema is None:
        raise AvroError("container has no avro.schema")
    try:
        schema = json.loads(raw_schema)
    except ValueError as e:
        raise AvroError(f"bad schema JSON: {e}") from None
    codec = meta.get("avro.codec", b"null").decode(
        "ascii", errors="replace"
    )
    return schema, codec, sync


def avro_schema(data: bytes) -> dict:
    """The writer schema (parsed JSON) of container bytes."""
    return _header(_Reader(bytes(data)))[0]


def avro_rows(data: bytes) -> list:
    """All rows of an Avro container file as Python values (records
    become dicts).  Raises :class:`AvroError` on any structural or
    unsupported-feature problem."""
    r = _Reader(bytes(data))
    schema, codec, sync = _header(r)
    out: list = []
    while r.i < len(r.b):
        n_rows = r.long()
        size = r.long()
        if n_rows < 0 or n_rows > _MAX_BLOCK_ROWS:
            raise AvroError(f"block declares {n_rows} rows")
        if size < 0 or size > _MAX_BLOCK_BYTES:
            raise AvroError(f"block declares {size} bytes")
        payload = _decompress(r.need(size), codec)
        if r.need(16) != sync:
            raise AvroError("sync marker mismatch (corrupt block)")
        br = _Reader(payload)
        for _ in range(n_rows):
            try:
                out.append(_decode(br, schema))
            except AvroError:
                raise
            except (KeyError, TypeError, IndexError, AttributeError,
                    ValueError) as e:
                # a corrupted-but-parseable schema JSON has arbitrary
                # shape — every malformation must surface typed
                raise AvroError(
                    f"malformed schema/structure: {e}"
                ) from None
        if br.i != len(br.b):
            raise AvroError("block has trailing bytes after last row")
    return out


def avro_to_spark_type(schema) -> T.DataType:
    """Writer schema → Spark type; ``["null", T]`` unions become
    nullable T (Spark types are nullable by default), other unions
    raise typed (no honest Spark mapping)."""
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1:
            raise AvroError(
                f"non-nullable union {schema!r} has no Spark mapping"
            )
        return avro_to_spark_type(branches[0])
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            return T.StructType(
                [
                    T.StructField(
                        f["name"], avro_to_spark_type(f["type"])
                    )
                    for f in schema.get("fields", [])
                ]
            )
        if t == "enum":
            return T.StringType()
        if t == "array":
            return T.ArrayType(avro_to_spark_type(schema["items"]))
        if t == "map":
            return T.MapType(
                T.StringType(), avro_to_spark_type(schema["values"])
            )
        if t == "fixed":
            return T.BinaryType()
        return avro_to_spark_type(t)
    simple = {
        "null": T.NullType(),
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "bytes": T.BinaryType(),
        "string": T.StringType(),
    }
    if schema in simple:
        return simple[schema]
    raise AvroError(f"unsupported avro type {schema!r}")


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro container files under ``path`` (glob ok) as a DataFrame.

    Schema comes from ONE file's header read on the driver (all files
    must share it — the Kafka-Connect/Sqoop layout); decode then runs
    distributed, one file per task over the ``binaryFile`` listing.
    The top-level schema must be a record (rows need columns)."""
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise AvroError(f"no files under {path!r}")
    schema = avro_schema(bytes(first[0]["content"]))
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise AvroError("top-level schema must be a record")
    try:
        spark_schema = avro_to_spark_type(schema)
    except AvroError:
        raise
    except (KeyError, TypeError, IndexError, AttributeError) as e:
        raise AvroError(f"malformed schema: {e}") from None
    cols = [f.name for f in spark_schema.fields]

    def run(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                rows = avro_rows(bytes(blob))
                yield pd.DataFrame(
                    [[row.get(c) for c in cols] for row in rows],
                    columns=cols,
                )

    return files.select("content").mapInPandas(run, spark_schema)


# -------------------------------------------------------------------
# block-level input splits — the multi-GB-single-file shape
# -------------------------------------------------------------------
_HEADER_CAP = 1 << 20  # schemas are small; a 1 MB header is hostile


def avro_rows_range(path: str, start: int, end: int) -> list:
    """Rows of the blocks OWNED by byte range ``[start, end)`` of one
    container file — Hadoop input-split semantics: every block start
    is preceded by the 16-byte sync marker, so a range owns exactly
    the blocks whose first byte lands inside it, decoding past ``end``
    when its last block overruns.  The union of tiling ranges is
    therefore exactly-once over the file's rows.

    Sync candidates found by scanning are VALIDATED (plausible
    row-count and size varints, and the block must terminate with the
    sync marker again) so payload bytes that coincidentally contain
    the marker — possible under ``null`` codec, and exercised in the
    tests — cannot misalign the reader.  A hostile file that embeds a
    fully VALID block inside a payload can still double-frame its own
    rows (the format's sync design has no stronger integrity tier);
    that affects only the hostile file's rows and is stated here.

    IO is ``mmap`` (no full-file read): executors need POSIX access
    to ``path`` — local disk, NFS, or a fuse mount.  Object-store
    corpora should use :func:`read_avro`'s per-file tasks or repack."""
    import mmap

    if start < 0 or end < start:
        raise AvroError(f"bad range [{start}, {end})")
    with open(path, "rb") as fh:
        try:
            mm = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)
        except ValueError:
            return []  # empty file maps to no blocks
        with mm:
            hdr = _Reader(mm[: min(_HEADER_CAP, len(mm))])
            schema, codec, sync = _header(hdr)
            header_end = hdr.i
            n = len(mm)
            end = min(end, n)
            out: list = []
            # first candidate sync START within scan window: a sync
            # beginning at p puts a block start at p+16; owned iff
            # start <= p+16 < end.  The file header itself ends with
            # the sync, so the first data block needs no special case.
            p = mm.find(sync, max(start - 16, 0), end)
            while p != -1 and p + 16 < end:
                bs = p + 16  # candidate block start
                if bs < header_end:
                    p = mm.find(sync, p + 1, end)
                    continue
                r = _Reader(mm[bs : min(bs + 20, n)])
                try:
                    n_rows = r.long()
                    size = r.long()
                except AvroError:
                    p = mm.find(sync, p + 1, end)
                    continue
                body_at = bs + r.i
                if (
                    not 0 <= n_rows <= _MAX_BLOCK_ROWS
                    or not 0 <= size <= _MAX_BLOCK_BYTES
                ):
                    p = mm.find(sync, p + 1, end)
                    continue
                if body_at + size + 16 > n:
                    # plausible varints but the block runs past EOF: a
                    # truncated container must raise (whole-file
                    # parity), not silently skip the range's rows —
                    # a COINCIDENTAL sync this close to EOF with
                    # in-cap varints is a 2^-128 event, accepted
                    raise AvroError("truncated block")
                if mm[body_at + size : body_at + size + 16] != sync:
                    p = mm.find(sync, p + 1, end)
                    continue
                # validated: decode consecutive blocks while their
                # starts stay inside the range (each ends with sync,
                # so no re-scan is needed once aligned)
                pos = bs
                while pos < end and pos + 16 <= n:
                    br = _Reader(mm[pos : min(pos + 20, n)])
                    try:
                        n_rows = br.long()
                        size = br.long()
                    except AvroError as e:
                        raise AvroError(
                            f"corrupt block header at {pos}: {e}"
                        ) from None
                    if not 0 <= n_rows <= _MAX_BLOCK_ROWS:
                        raise AvroError(f"block declares {n_rows} rows")
                    if not 0 <= size <= _MAX_BLOCK_BYTES:
                        raise AvroError(f"block declares {size} bytes")
                    body = pos + br.i
                    if body + size + 16 > n:
                        raise AvroError("truncated block")
                    if mm[body + size : body + size + 16] != sync:
                        raise AvroError(
                            "sync marker mismatch (corrupt block)"
                        )
                    payload = _decompress(mm[body : body + size], codec)
                    pr = _Reader(payload)
                    for _ in range(n_rows):
                        try:
                            out.append(_decode(pr, schema))
                        except AvroError:
                            raise
                        except (KeyError, TypeError, IndexError,
                                AttributeError, ValueError) as e:
                            raise AvroError(
                                f"malformed schema/structure: {e}"
                            ) from None
                    if pr.i != len(pr.b):
                        raise AvroError(
                            "block has trailing bytes after last row"
                        )
                    pos = body + size + 16
                return out
            return out


def read_avro_split(
    spark: SparkSession,
    path: str,
    split_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """:func:`read_avro` for the OTHER file layout — few huge
    container files (a dumped DB export) instead of many small ones.
    Each file is tiled into ``split_bytes`` ranges and every range
    decodes its owned blocks via :func:`avro_rows_range`, so one
    multi-GB file parallelizes across the cluster exactly like a
    Hadoop input split (this closes the module's former stated
    boundary: "repack such files").  Paths must be POSIX-visible from
    executors (see :func:`avro_rows_range`)."""
    import glob as _glob
    import os

    if split_bytes < 1:
        raise AvroError(f"split_bytes must be >= 1, got {split_bytes}")
    paths = sorted(_glob.glob(path)) or [path]
    sizes = []
    for pth in paths:
        try:
            sizes.append(os.path.getsize(pth))
        except OSError as e:
            raise AvroError(f"cannot stat {pth!r}: {e}") from None
    with open(paths[0], "rb") as fh:
        schema = avro_schema(fh.read(_HEADER_CAP))
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise AvroError("top-level schema must be a record")
    try:
        spark_schema = avro_to_spark_type(schema)
    except AvroError:
        raise
    except (KeyError, TypeError, IndexError, AttributeError) as e:
        raise AvroError(f"malformed schema: {e}") from None
    cols = [f.name for f in spark_schema.fields]
    ranges = [
        (pth, s, min(s + split_bytes, size))
        for pth, size in zip(paths, sizes)
        for s in range(0, max(size, 1), split_bytes)
    ]
    rdf = spark.createDataFrame(
        ranges, "path string, start long, end long"
    ).repartition(max(len(ranges), 1))

    def run(batches):
        for pdf in batches:
            for pth, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                rows = avro_rows_range(pth, int(s), int(e))
                yield pd.DataFrame(
                    [[row.get(c) for c in cols] for row in rows],
                    columns=cols,
                )

    return rdf.mapInPandas(run, spark_schema)


# -------------------------------------------------------------------
# writer — for tests, gates, and round-trip sinks
# -------------------------------------------------------------------
def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(buf: bytearray, schema, val, depth: int = 0) -> None:
    if depth > _MAX_DEPTH:
        raise AvroError("schema recursion too deep")
    if isinstance(schema, list):
        for idx, branch in enumerate(schema):
            if (val is None) == (branch == "null"):
                buf += _zigzag(idx)
                _encode(buf, branch, val, depth + 1)
                return
        raise AvroError(f"no union branch for {val!r}")
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            for f in schema.get("fields", []):
                _encode(buf, f["type"], val[f["name"]], depth + 1)
            return
        if t == "enum":
            buf += _zigzag(schema["symbols"].index(val))
            return
        if t == "array":
            if val:
                buf += _zigzag(len(val))
                for v in val:
                    _encode(buf, schema["items"], v, depth + 1)
            buf += _zigzag(0)
            return
        if t == "map":
            if val:
                buf += _zigzag(len(val))
                for k, v in val.items():
                    buf += _zigzag(len(k.encode())) + k.encode()
                    _encode(buf, schema["values"], v, depth + 1)
            buf += _zigzag(0)
            return
        if t == "fixed":
            buf += val
            return
        _encode(buf, t, val, depth + 1)
        return
    if schema == "null":
        return
    if schema == "boolean":
        buf += b"\x01" if val else b"\x00"
    elif schema in ("int", "long"):
        buf += _zigzag(int(val))
    elif schema == "float":
        buf += struct.pack("<f", val)
    elif schema == "double":
        buf += struct.pack("<d", val)
    elif schema == "bytes":
        buf += _zigzag(len(val)) + bytes(val)
    elif schema == "string":
        enc = val.encode("utf-8")
        buf += _zigzag(len(enc)) + enc
    else:
        raise AvroError(f"unsupported avro type {schema!r}")


def write_avro(
    schema: dict,
    rows: list,
    codec: str = "null",
    block_rows: int = 1000,
    sync: bytes = b"\x07" * 16,
) -> bytes:
    """Serialize ``rows`` into container bytes (deterministic: fixed
    sync marker, stable metadata order) — the test/gate twin of
    :func:`avro_rows` and a small-file sink."""
    out = bytearray(_MAGIC)
    meta = [
        ("avro.codec", codec.encode()),
        ("avro.schema", json.dumps(schema, sort_keys=True).encode()),
    ]
    out += _zigzag(len(meta))
    for k, v in meta:
        out += _zigzag(len(k.encode())) + k.encode()
        out += _zigzag(len(v)) + v
    out += _zigzag(0)
    out += sync
    for start in range(0, len(rows), block_rows):
        chunk = rows[start : start + block_rows]
        body = bytearray()
        for row in chunk:
            _encode(body, schema, row)
        payload = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw, per spec
        elif codec == "bzip2":
            payload = bz2.compress(payload)
        elif codec == "xz":
            payload = lzma.compress(payload)
        elif codec == "snappy":
            payload = snappy_compress(payload) + zlib.crc32(
                payload
            ).to_bytes(4, "big")
        elif codec == "zstd":
            # write-side uses pyarrow's bundled libzstd (the same
            # anchor the read path's fast path and the zstd interop
            # tests use); reading back goes through the from-spec
            # decoder, so every write is differentially checked
            try:
                import pyarrow as pa

                payload = bytes(pa.Codec("zstd").compress(payload))
            except Exception as e:  # pragma: no cover - pyarrow baked in
                # broad on purpose: a pyarrow built WITHOUT zstd raises
                # ValueError from Codec(), not ImportError — the
                # module's typed contract must hold either way
                raise AvroError(
                    f"avro codec 'zstd' needs pyarrow's zstd: {e}"
                ) from None
        elif codec != "null":
            raise AvroError(f"unsupported avro codec {codec!r}")
        out += _zigzag(len(chunk)) + _zigzag(len(payload))
        out += payload + sync
    return bytes(out)


# -------------------------------------------------------------------
# snappy — the DEFAULT avro codec in the wild (Kafka Connect emits
# it), no library in this environment, so the raw-block format
# (public spec: google/snappy format_description.txt) is implemented
# directly. Avro frames each block as snappy(raw) + 4-byte BIG-endian
# CRC32 of the UNCOMPRESSED bytes.
# -------------------------------------------------------------------
def snappy_decompress(data: bytes, max_out: int = _MAX_BLOCK_BYTES) -> bytes:
    """Raw snappy block decoding: varint preamble, literal tags and
    the three copy forms (1/2/4-byte offsets), overlapping copies
    repeat the pattern per spec.  Typed :class:`AvroError` on any
    malformation; output bounded by ``max_out``."""
    data = bytes(data)
    n = len(data)
    i = 0
    # preamble: PLAIN varint (not zigzag) = uncompressed length
    shift = 0
    out_len = 0
    while True:
        if i >= n:
            raise AvroError("snappy: truncated preamble")
        b = data[i]
        i += 1
        out_len |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise AvroError("snappy: preamble varint overflow")
    if out_len > max_out:
        raise AvroError(f"snappy: declares {out_len} bytes (cap)")
    out = bytearray()
    while i < n:
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                extra = ln - 60
                if i + extra > n:
                    raise AvroError("snappy: truncated literal length")
                ln = int.from_bytes(data[i : i + extra], "little") + 1
                i += extra
            if i + ln > n:
                raise AvroError("snappy: literal runs past input")
            out += data[i : i + ln]
            i += ln
        else:
            if kind == 1:  # copy, 1-byte offset
                ln = ((tag >> 2) & 0x7) + 4
                if i >= n:
                    raise AvroError("snappy: truncated copy-1")
                off = ((tag >> 5) << 8) | data[i]
                i += 1
            elif kind == 2:  # copy, 2-byte offset
                ln = (tag >> 2) + 1
                if i + 2 > n:
                    raise AvroError("snappy: truncated copy-2")
                off = int.from_bytes(data[i : i + 2], "little")
                i += 2
            else:  # copy, 4-byte offset
                ln = (tag >> 2) + 1
                if i + 4 > n:
                    raise AvroError("snappy: truncated copy-4")
                off = int.from_bytes(data[i : i + 4], "little")
                i += 4
            if off == 0 or off > len(out):
                raise AvroError(f"snappy: copy offset {off} invalid")
            if len(out) + ln > out_len:
                raise AvroError("snappy: output exceeds preamble")
            if off >= ln:
                start = len(out) - off
                out += out[start : start + ln]
            else:  # overlapping: the pattern repeats
                start = len(out) - off
                pat = out[start:]
                reps = ln // off + 1
                out += (pat * reps)[:ln]
        if len(out) > out_len:
            raise AvroError("snappy: output exceeds preamble")
    if len(out) != out_len:
        raise AvroError(
            f"snappy: produced {len(out)} != declared {out_len}"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Literal-only snappy encoding — spec-legal (any decoder must
    accept it; compression ratio 1.0).  The writer-side twin that
    makes the decoder round-trip-testable without a snappy library."""
    data = bytes(data)
    n = len(data)
    out = bytearray()
    v = n
    while True:  # plain varint preamble
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            break
    i = 0
    while i < n:
        chunk = min(n - i, 65536)
        if chunk <= 60:
            out.append((chunk - 1) << 2)
        else:
            # tag value 61 = "length in the next 2 bytes" (60->1,
            # 61->2, 62->3, 63->4 bytes; count = tag - 59)
            out.append(61 << 2)
            out += (chunk - 1).to_bytes(2, "little")
        out += data[i : i + chunk]
        i += chunk
    return bytes(out)


# -------------------------------------------------------------------
# sink side: DataFrame -> container payloads
# -------------------------------------------------------------------
_SPARK_TO_AVRO = {
    "long": "long",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "string": "string",
    "binary": "bytes",
}


def spark_to_avro_schema(st, name: str = "Row", _path: str = "") -> dict:
    """Spark StructType -> Avro record schema (the reverse of
    :func:`avro_to_spark_type`).  Every field is written as the
    nullable union ``["null", T]`` — Spark columns are nullable by
    default and the reader maps the union straight back."""
    fields = []
    for f in st.fields:
        fields.append(
            {"name": f.name,
             "type": ["null", _avro_type(f.dataType, f.name)]}
        )
    return {"type": "record", "name": name, "fields": fields}


def _avro_type(dt, name: str):
    tn = dt.typeName()
    if tn in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[tn]
    if tn == "array":
        return {"type": "array",
                "items": ["null", _avro_type(dt.elementType, name)]}
    if tn == "map":
        if dt.keyType.typeName() != "string":
            raise AvroError("avro maps require string keys")
        return {"type": "map",
                "values": ["null", _avro_type(dt.valueType, name)]}
    if tn == "struct":
        return spark_to_avro_schema(dt, name=f"{name}_rec")
    raise AvroError(f"no avro mapping for Spark type {tn}")


def _to_py(val, dt):
    """pandas/Arrow cell -> the plain-Python shape _encode expects
    (numpy scalars unboxed, Arrow maps arrive as (k, v) tuple lists,
    NaN-for-null normalized)."""
    import numpy as np

    if val is None or (isinstance(val, float) and val != val):
        return None
    tn = dt.typeName()
    if tn == "array":
        return [_to_py(v, dt.elementType) for v in val]
    if tn == "map":
        items = val.items() if isinstance(val, dict) else val
        return {str(k): _to_py(v, dt.valueType) for k, v in items}
    if tn == "struct":
        d = val.asDict() if hasattr(val, "asDict") else dict(val)
        return {f.name: _to_py(d.get(f.name), f.dataType)
                for f in dt.fields}
    if tn == "binary":
        return bytes(val)
    if tn in ("long", "integer", "short", "byte"):
        return int(val)
    if tn in ("double", "float"):
        return float(val)
    if tn == "boolean":
        return bool(val)
    if tn == "string":
        return str(val)
    if isinstance(val, np.generic):
        return val.item()
    return val


def avro_shards(
    df: DataFrame,
    codec: str = "deflate",
    name: str = "Row",
) -> DataFrame:
    """``df`` serialized to Avro container payloads, one row per Arrow
    batch: ``(n_rows long, content binary)``.  This is the honest
    distributed sink shape: executors never touch a filesystem —
    compose the payload rows with whatever writer owns your storage
    (``foreachPartition`` + an FS client, an uploader job, or
    :func:`write_avro_files` for local paths).  Tune batch size with
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.

    **NaN coercion (stated, lossy):** rows cross to Python as
    Arrow/pandas batches, where a float column represents SQL NULL as
    NaN — NULL and a genuine NaN are indistinguishable at that point.
    Both are written as Avro ``null``; a double column containing real
    NaN values does NOT round-trip them (they come back as NULL).
    Corpora that must preserve NaN-vs-NULL should encode the
    distinction explicitly (e.g. a boolean companion column) before
    this sink (r12 ADVICE)."""
    import pyspark.sql.types as T_

    schema = spark_to_avro_schema(df.schema, name=name)
    dts = {f.name: f.dataType for f in df.schema.fields}
    cols = list(dts)

    def run(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                rows.append(
                    {c: _to_py(rec.get(c), dts[c]) for c in cols}
                )
            payload = write_avro(schema, rows, codec=codec)
            yield pd.DataFrame(
                {"n_rows": [len(rows)], "content": [payload]}
            )

    out_schema = T_.StructType(
        [
            T_.StructField("n_rows", T_.LongType()),
            T_.StructField("content", T_.BinaryType()),
        ]
    )
    return df.mapInPandas(run, out_schema)


def write_avro_files(df: DataFrame, path: str, codec: str = "deflate",
                     name: str = "Row") -> int:
    """Convenience local-filesystem writer: streams the shard rows
    through the driver (``toLocalIterator`` — one shard in memory at
    a time, never a full collect) into ``path/part-<i>.avro``.
    Returns the shard count.  For cluster storage compose
    :func:`avro_shards` with your FS client instead (stated).
    Inherits :func:`avro_shards`' NaN→null coercion for float/double
    columns (see its docstring)."""
    import os

    os.makedirs(path, exist_ok=True)
    n = 0
    for row in avro_shards(df, codec=codec, name=name).toLocalIterator():
        if row["n_rows"] == 0:
            continue
        with open(os.path.join(path, f"part-{n:05d}.avro"), "wb") as fh:
            fh.write(bytes(row["content"]))
        n += 1
    return n
