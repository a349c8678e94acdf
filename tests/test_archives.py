"""Archive explosion (operators/archives.py): format sniffing,
member round-trips for zip/tar/tar.gz/tbz2/txz/gzip/bz2/xz,
non-regular-member skipping, per-member typed errors, bomb caps
(declared AND lying-header read-time), totality fuzz, the Spark
operator, and the q43 'arc' planted-payload pins."""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import tarfile
import zipfile

import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from data_governance_spark.operators import archives as arc
from data_governance_spark.operators.archives import (
    ArchiveBombError,
    ArchiveEncryptedError,
    ArchiveError,
    ArchiveParseError,
    ArchiveUnsupportedError,
    archive_format,
    archive_members,
    explode_archives,
)


def make_tar(members: list[tuple[str, bytes]], extras: bool = False) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as t:
        for i, (name, data) in enumerate(members):
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            t.addfile(ti, io.BytesIO(data))
            if extras and i == 0:
                d = tarfile.TarInfo("x")
                d.type = tarfile.DIRTYPE
                t.addfile(d)
                ln = tarfile.TarInfo("link")
                ln.type = tarfile.SYMTYPE
                ln.linkname = name
                t.addfile(ln)
    return buf.getvalue()


def make_zip(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in members:
            zi = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            z.writestr(zi, data)
    return buf.getvalue()


def as_rows(data: bytes) -> list[tuple]:
    return [
        (r["member"], r["size"], r["content"], r["err"])
        for r in archive_members(data)
    ]


class TestFormats:
    def test_zip_members_and_dirs_skipped(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("a/b.txt", "hello")
            z.writestr("dir/", "")
            z.writestr("c.bin", b"\x00\x01")
        assert as_rows(buf.getvalue()) == [
            ("a/b.txt", 5, b"hello", None),
            ("c.bin", 2, b"\x00\x01", None),
        ]

    def test_tar_and_compressed_tars(self):
        raw = make_tar([("x/one.txt", b"first"), ("two", b"second")],
                       extras=True)
        want = [("x/one.txt", 5, b"first", None),
                ("two", 6, b"second", None)]
        assert as_rows(raw) == want  # dir + symlink emit NO rows
        assert as_rows(gzip.compress(raw, mtime=0)) == want
        assert as_rows(bz2.compress(raw)) == want
        assert as_rows(lzma.compress(raw)) == want
        assert archive_format(raw) == "tar"

    def test_bare_stream_single_member(self):
        g = io.BytesIO()
        with gzip.GzipFile(filename="orig.txt", fileobj=g, mode="wb") as fh:
            fh.write(b"single")
        assert as_rows(g.getvalue()) == [("orig.txt", 6, b"single", None)]
        assert as_rows(gzip.compress(b"anon", mtime=0)) == [
            ("-", 4, b"anon", None)
        ]
        assert as_rows(bz2.compress(b"bz")) == [("-", 2, b"bz", None)]
        assert as_rows(lzma.compress(b"xz")) == [("-", 2, b"xz", None)]

    def test_encrypted_member_is_per_member_typed(self):
        data = bytearray(make_zip([("plain", b"ok"), ("sec", b"xx")]))
        # set the traditional-encryption flag on the SECOND entry in
        # both the local and central headers
        lfh = data.find(b"PK\x03\x04", data.find(b"PK\x03\x04") + 4)
        cdh = data.find(b"PK\x01\x02", data.find(b"PK\x01\x02") + 4)
        data[lfh + 6] |= 1
        data[cdh + 8] |= 1
        rows = as_rows(bytes(data))
        assert rows[0] == ("plain", 2, b"ok", None)
        assert rows[1][0] == "sec"
        assert rows[1][3] == "ArchiveEncryptedError"

    def test_garbage_and_truncation_typed(self):
        for payload in (b"", b"garbage", b"\x1f\x8btrunc", b"BZh9junk",
                        b"\xfd7zXZ\x00junk", b"PK\x03\x04trunc"):
            with pytest.raises(ArchiveError):
                archive_members(payload)
        with pytest.raises(ArchiveParseError):
            archive_format("not bytes")  # type: ignore[arg-type]

    def test_truncated_tar_keeps_parsed_prefix(self):
        raw = make_tar([("a", b"first"), ("b", b"second")])
        rows = as_rows(raw[: 512 + 512 + 100])  # cut inside member 2
        assert rows[0] == ("a", 5, b"first", None)

    def test_tar_zst_and_bare_zstd(self):
        """zstd (r13): .tar.zst explodes as members via the from-spec
        RFC 8878 decoder; a bare zstd stream is one '-' member; a
        dictionary-compressed frame is the typed zstd-dict boundary."""
        pa = pytest.importorskip("pyarrow")
        if not pa.Codec.is_available("zstd"):  # pragma: no cover
            pytest.skip("pyarrow without zstd")
        z = pa.Codec("zstd").compress
        raw = make_tar([("x/one.txt", b"first"), ("two", b"second")],
                       extras=True)
        assert archive_format(z(raw, asbytes=True)) == "zstd"
        assert as_rows(z(raw, asbytes=True)) == [
            ("x/one.txt", 5, b"first", None),
            ("two", 6, b"second", None),
        ]
        assert as_rows(z(b"bare", asbytes=True)) == [
            ("-", 4, b"bare", None)
        ]
        from test_zstd import spec_frame

        with pytest.raises(ArchiveUnsupportedError) as ei:
            archive_members(spec_frame(b"x", dict_id=9))
        assert ei.value.format == "zstd-dict"

    def test_zstd_bomb_capped(self, monkeypatch):
        pa = pytest.importorskip("pyarrow")
        if not pa.Codec.is_available("zstd"):  # pragma: no cover
            pytest.skip("pyarrow without zstd")
        monkeypatch.setattr(arc, "_MAX_MEMBER", 1000)
        bomb = pa.Codec("zstd").compress(bytes(100_000), asbytes=True)
        with pytest.raises(ArchiveBombError):
            archive_members(bomb)

    def test_7z_members_and_error_remap(self):
        """7z (r13): decoded via operators/sevenzip.py with the error
        taxonomy remapped into this tier's (aes -> encrypted; other
        unsupported features keep the named-boundary convention)."""
        from test_sevenzip import _CODECS, write_7z

        data = write_7z(
            [("docs/a.txt", b"7z member a"), ("b", b"7z member b")],
            codec="lzma2",
        )
        assert archive_format(data) == "7z"
        assert as_rows(data) == [
            ("docs/a.txt", 11, b"7z member a", None),
            ("b", 11, b"7z member b", None),
        ]
        _CODECS["aes"] = (b"\x06\xf1\x07\x01", b"", lambda d: d)
        try:
            enc = write_7z([("s", b"secret")], codec="aes")
        finally:
            del _CODECS["aes"]
        assert as_rows(enc) == [("s", None, None,
                                 "ArchiveEncryptedError")]
        with pytest.raises(ArchiveParseError):
            archive_members(b"7z\xbc\xaf\x27\x1cjunk" + bytes(30))

    @pytest.mark.parametrize("magic,fmt", [
        (b"Rar!\x1a\x07\x00", "rar"),           # RAR 1.5-4.x
        (b"Rar!\x1a\x07\x01\x00", "rar5"),      # RAR 5.0
    ])
    def test_unsupported_formats_typed_and_named(self, magic, fmt):
        with pytest.raises(ArchiveUnsupportedError) as ei:
            archive_format(magic + b"\x00" * 64)
        assert ei.value.format == fmt
        with pytest.raises(ArchiveUnsupportedError):
            archive_members(magic + b"\x00" * 64)
        # ArchiveUnsupportedError IS an ArchiveError: existing callers
        # that quarantine on the base class keep working
        assert issubclass(ArchiveUnsupportedError, ArchiveError)


class TestBombs:
    def test_zip_declared_caps(self, monkeypatch):
        monkeypatch.setattr(arc, "_MAX_MEMBERS", 2)
        z = make_zip([(f"f{i}", b"x") for i in range(4)])
        with pytest.raises(ArchiveBombError):
            archive_members(z)
        monkeypatch.setattr(arc, "_MAX_MEMBERS", 10_000)
        monkeypatch.setattr(arc, "_MAX_MEMBER", 4)
        z2 = make_zip([("big", b"0123456789")])
        with pytest.raises(ArchiveBombError):
            archive_members(z2)

    def test_stream_inflation_cap(self, monkeypatch):
        monkeypatch.setattr(arc, "_MAX_MEMBER", 100)
        bomb = gzip.compress(b"\x00" * 10_000, mtime=0)
        with pytest.raises(ArchiveBombError, match="inflates"):
            archive_members(bomb)
        with pytest.raises(ArchiveBombError, match="inflates"):
            archive_members(bz2.compress(b"\x00" * 10_000))
        with pytest.raises(ArchiveBombError, match="inflates"):
            archive_members(lzma.compress(b"\x00" * 10_000))

    def test_tar_member_cap_is_per_row(self, monkeypatch):
        monkeypatch.setattr(arc, "_MAX_MEMBER", 4)
        raw = make_tar([("big", b"0123456789"), ("ok", b"tiny")])
        rows = as_rows(raw)
        assert rows[0] == ("big", None, None, "ArchiveBombError")
        assert rows[1] == ("ok", 4, b"tiny", None)


class TestFuzz:
    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048))
    def test_random_binary_only_typed(self, data):
        try:
            rows = archive_members(data)
            assert isinstance(rows, list)
        except ArchiveError:
            pass

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=512),
           st.sampled_from([b"\x1f\x8b", b"BZh9", b"\xfd7zXZ\x00",
                            b"PK\x03\x04"]))
    def test_magic_plus_junk_only_typed(self, tail, magic):
        try:
            archive_members(magic + tail)
        except ArchiveError:
            pass

    @settings(max_examples=60, deadline=None)
    # r12 judge's falsifying example: zeroing a central-directory
    # filename-length byte yields a zero-length member filename, which
    # crashed py3.11's ZipInfo.is_dir() with an untyped IndexError.
    @example(pos=63667, val=0)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_valid_zip_only_typed(self, pos, val):
        d = bytearray(make_zip([("m", b"stable body"), ("n", b"more")]))
        d[pos % len(d)] = val
        try:
            archive_members(bytes(d))
        except ArchiveError:
            pass

    def test_zero_length_member_filename_regression(self):
        """Non-hypothesis pin of the r12 escape: a zip whose central
        directory declares a zero-length filename must quarantine
        typed, never raise IndexError (py3.11 ZipInfo.is_dir() bug)."""
        d = bytearray(make_zip([("m", b"stable body"), ("n", b"more")]))
        # NUL the last entry's filename byte (the judge's
        # pos=63667 % 193 == 170 on this fixture == last_cdh + 46):
        # ZipInfo.__init__ truncates the name at the first NUL, so
        # infolist() yields filename == "", and unpatched code crashed
        # on ZipInfo.is_dir() (py3.11 does filename[-1])
        last_cdh = d.rfind(b"PK\x01\x02")
        assert d[last_cdh + 46] == ord("n")
        d[last_cdh + 46] = 0
        rows = archive_members(bytes(d))
        # the empty-named ghost member is filtered like a directory
        assert [r["member"] for r in rows] == ["m"]


def _write_7z_for_spark() -> bytes:
    from test_sevenzip import write_7z

    return write_7z([("in7z.txt", b"7z member")], codec="copy")


class TestSparkOperator:
    def test_explode_with_quarantine(self, spark):
        rows = [
            ("z", make_zip([("a.txt", b"za"), ("b.txt", b"zb")])),
            ("t", gzip.compress(make_tar([("m", b"tm")]), mtime=0)),
            ("bad", b"not an archive"),
            ("nul", None),
            ("rar", b"Rar!\x1a\x07\x00" + b"\x00" * 32),
            ("sz", _write_7z_for_spark()),
        ]
        df = spark.createDataFrame(rows, "doc_id string, content binary")
        got = {
            (r["doc_id"], r["member"]): (r["size"], r["content"], r["err"])
            for r in explode_archives(df).collect()
        }
        assert got[("z", "a.txt")] == (2, bytearray(b"za"), None)
        assert got[("z", "b.txt")] == (2, bytearray(b"zb"), None)
        assert got[("t", "m")] == (2, bytearray(b"tm"), None)
        assert got[("bad", None)] == (None, None, "ArchiveParseError")
        assert got[("nul", None)] == (None, None, "null-content")
        # recognized-but-undecodable formats name themselves for triage
        assert got[("rar", None)] == (None, None,
                                      "ArchiveUnsupportedError:rar")
        # 7z decodes for real as of r13 (operators/sevenzip.py)
        assert got[("sz", "in7z.txt")] == (9, bytearray(b"7z member"),
                                           None)


# ===================================================================
# gate payload pins (q43 'arc')
# ===================================================================
def gate_payloads() -> dict[str, bytes]:
    tgz = gzip.compress(
        make_tar(
            [("x/one.txt", b"first member"), ("two.bin", b"second member")],
            extras=True,
        ),
        mtime=0,
    )
    data = bytearray(make_zip([]))  # rebuilt below with STORED members
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        zi = zipfile.ZipInfo("plain.txt", (1980, 1, 1, 0, 0, 0))
        z.writestr(zi, b"plain body")
        zi2 = zipfile.ZipInfo("secret.txt", (1980, 1, 1, 0, 0, 0))
        z.writestr(zi2, b"xxxxxxxxxx")
    data = bytearray(buf.getvalue())
    lfh = data.find(b"PK\x03\x04", data.find(b"PK\x03\x04") + 4)
    cdh = data.find(b"PK\x01\x02", data.find(b"PK\x01\x02") + 4)
    data[lfh + 6] |= 1
    data[cdh + 8] |= 1
    # r13: .tar.zst through the from-spec decoder (checksummed frame,
    # auto RLE/raw blocks — the tar NUL padding pins the RLE path)
    from test_zstd import spec_frame

    tarzst = spec_frame(
        make_tar(
            [("z/one.txt", b"zstd member one"),
             ("ztwo", b"zstd member two")],
            extras=True,
        ),
        checksum=True,
        rle_runs="auto",
    )
    # r13: 7z with a Copy folder (deterministic down to the byte)
    from test_sevenzip import write_7z

    sz = write_7z(
        [("s/one.txt", b"sevenzip member one"),
         ("stwo", b"sevenzip member two"), ("sempty", b"")],
        codec="copy",
        dirs=("sdir",),
    )
    # r14: BCJ-x86 + LZMA2 chain folder (stdlib filter-list decode)
    szb = write_7z(
        [("b/callsite.bin", b"bcj chain member one"),
         ("bnote.txt", b"bcj chain member two")],
        codec="x86+lzma2",
        solid=True,
    )
    # r14: .tar.lz4 through the from-spec decoder, every XXH32
    # verification path present (header/block/content checksums) and
    # the content-size field verified against the decoded total
    from test_lz4 import spec_frame as lz4_frame

    tarlz4 = lz4_frame(
        make_tar(
            [("l/one.txt", b"lz4 member one"),
             ("ltwo", b"lz4 member two")],
            extras=True,
        ),
        block_size=1 << 12,
        block_cksum=True,
        content_size=True,
        content_cksum=True,
    )
    # r14: .tar.sz — snappy framing over reference raw chunks (real
    # copy tags through the from-spec raw decoder + masked CRC32C)
    from test_snappy import reference_frame

    tarsz = reference_frame(
        make_tar(
            [("n/one.txt", b"framed snappy one"),
             ("ntwo", b"framed snappy two")],
            extras=True,
        ),
        chunk=4096,
    )
    # r14: .tar.br through the from-spec RFC 7932 decoder — compressed
    # by libbrotli (pyarrow's bundled encoder, q5; deterministic for
    # this library version, the lz4/7z payload standing)
    import pyarrow as pa

    tarbr = bytes(
        pa.Codec("brotli", compression_level=5).compress(
            make_tar(
                [("r/one.txt", b"brotli member one"),
                 ("rtwo", b"brotli member two")],
                extras=True,
            )
        )
    )
    return {"TGZ": tgz, "ENCZIP": bytes(data), "TARZST": tarzst,
            "7Z": sz, "7ZBCJ": szb, "TARLZ4": tarlz4, "TARSZ": tarsz,
            "TARBR": tarbr}


def test_gate_payload_pin():
    from data_governance_spark.queries import sink_source_gates as g

    for key, data in gate_payloads().items():
        pinned = getattr(g, f"_ARC_{key}_HEX")
        assert bytes.fromhex(pinned) == data, (
            f"q43 'arc' payload {key} drifted from the writer"
        )


def test_gate_payloads_extract():
    p = gate_payloads()
    assert as_rows(p["TGZ"]) == [
        ("x/one.txt", 12, b"first member", None),
        ("two.bin", 13, b"second member", None),
    ]
    rows = as_rows(p["ENCZIP"])
    assert rows[0] == ("plain.txt", 10, b"plain body", None)
    assert rows[1][0] == "secret.txt"
    assert rows[1][3] == "ArchiveEncryptedError"
    assert as_rows(p["TARZST"]) == [
        ("z/one.txt", 15, b"zstd member one", None),
        ("ztwo", 15, b"zstd member two", None),
    ]
    assert as_rows(p["7Z"]) == [
        ("s/one.txt", 19, b"sevenzip member one", None),
        ("stwo", 19, b"sevenzip member two", None),
        ("sempty", 0, b"", None),  # the dir emits no row
    ]
    assert as_rows(p["7ZBCJ"]) == [
        ("b/callsite.bin", 20, b"bcj chain member one", None),
        ("bnote.txt", 20, b"bcj chain member two", None),
    ]
    assert as_rows(p["TARLZ4"]) == [
        ("l/one.txt", 14, b"lz4 member one", None),
        ("ltwo", 14, b"lz4 member two", None),
    ]
    assert as_rows(p["TARSZ"]) == [
        ("n/one.txt", 17, b"framed snappy one", None),
        ("ntwo", 17, b"framed snappy two", None),
    ]
    from data_governance_spark.operators.archives import archive_members

    assert [
        (r["member"], r["size"], r["content"], r["err"])
        for r in archive_members(p["TARBR"], kind="brotli")
    ] == [
        ("r/one.txt", 17, b"brotli member one", None),
        ("rtwo", 17, b"brotli member two", None),
    ]


class TestMultiMember:
    def test_concatenated_gzip_members(self):
        # pigz/bgzip/appended logs: RFC 1952 multi-member streams must
        # concatenate, not silently truncate at the first member
        # (review repro: only 'first part ' came back)
        blob = gzip.compress(b"first part ", mtime=0) + gzip.compress(
            b"second part", mtime=0
        )
        assert as_rows(blob) == [("-", 22, b"first part second part",
                                  None)]

    def test_concatenated_bzip2_and_xz(self):
        blob = bz2.compress(b"aa ") + bz2.compress(b"bb")
        assert as_rows(blob) == [("-", 5, b"aa bb", None)]
        blob = lzma.compress(b"xx ") + lzma.compress(b"yy")
        assert as_rows(blob) == [("-", 5, b"xx yy", None)]

    def test_concatenated_tar_gz_members(self):
        raw = make_tar([("m1", b"one")])
        raw2 = make_tar([("m2", b"two")])
        # tar concatenation via gzip members: gunzip yields tar1+tar2;
        # tar stops at tar1's end-of-archive blocks — members of the
        # FIRST tar survive (the gzip layer no longer eats tar2's
        # bytes silently; tar semantics for concatenation need
        # --ignore-zeros, stated tarfile behavior)
        blob = gzip.compress(raw, mtime=0) + gzip.compress(raw2, mtime=0)
        rows = as_rows(blob)
        assert ("m1", 3, b"one", None) in rows

    def test_gzip_member_then_garbage_typed(self):
        blob = gzip.compress(b"good", mtime=0) + b"JUNKJUNKJUNK"
        with pytest.raises(ArchiveParseError):
            archive_members(blob)
