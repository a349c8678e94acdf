"""Brotli decoder (operators/brotli.py): differential against REAL
libbrotli output (pyarrow's bundled encoder), RFC structure edge
cases, dictionary/transform paths, bomb caps, hostile fuzz, and the
archives-tier integration with the extension hint (brotli has no
stream magic)."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.brotli import (
    BrotliBombError,
    BrotliError,
    BrotliParseError,
    brotli_decompress,
)
from data_governance_spark.operators.brotli_data import (
    DICT_DATA,
    DICT_OFFSETS,
    DICT_SIZE_BITS,
    TRANSFORMS,
)


def _c(data: bytes, q: int = 5) -> bytes:
    return bytes(pa.Codec("brotli", compression_level=q).compress(data))


# ---------------------------------------------------------- differential
_SHAPES = {
    "empty": b"",
    "tiny": b"hi",
    "text": b"the quick brown fox jumps over the lazy dog. " * 300,
    "dictwords": b" ".join(
        w
        for w in (b"time", b"information", b"development", b"people",
                  b"public", b"different", b"system", b"government")
        for _ in range(40)
    ),
    "binary": random.Random(1).randbytes(8000),
    "zeros": b"\0" * 20000,
    "utf8": "úñïçôdê têxt with émphasis — ünd sò ön. ".encode() * 200,
}


@pytest.mark.parametrize("q", [0, 1, 5, 9, 11])
@pytest.mark.parametrize("name", sorted(_SHAPES))
def test_differential_vs_libbrotli(q, name):
    data = _SHAPES[name]
    assert brotli_decompress(_c(data, q)) == data


def test_differential_large_multi_metablock():
    data = (b"The industrial revolution and its consequences. " * 50000)
    assert brotli_decompress(_c(data, 4)) == data
    rng = random.Random(3)
    blob = rng.randbytes(2_000_000)  # forces uncompressed meta-blocks
    assert brotli_decompress(_c(blob, 1)) == blob


def test_differential_randomized_sweep():
    rng = random.Random(17)
    for i in range(40):
        n = rng.randrange(0, 20000)
        kind = i % 4
        if kind == 0:
            data = rng.randbytes(n)
        elif kind == 1:
            data = bytes(rng.randrange(3) for _ in range(n))
        elif kind == 2:
            data = (b"lorem ipsum dolor sit amet " * (n // 20 + 1))[:n]
        else:
            data = b"".join(
                rng.choice([b"static", b"void", b"public "])
                for _ in range(n // 6)
            )
        q = rng.choice([0, 2, 6, 10])
        assert brotli_decompress(_c(data, q)) == data, (i, kind, q)


def test_small_input_forces_dictionary_reference():
    # a single dictionary word, never repeated: at q11 libbrotli emits
    # a static-dictionary reference (no window content to copy from)
    for word in (b"information", b"development", b"the first time"):
        assert brotli_decompress(_c(word, 11)) == word


# ---------------------------------------------------------- structure
def test_empty_stream_one_byte():
    # ISLAST=1, ISLASTEMPTY=1 in a single byte ('\x06'): valid empty
    assert brotli_decompress(b"\x06") == b""


def test_truncated_raises_typed():
    full = _c(_SHAPES["text"])
    for cut in (0, 1, len(full) // 2, len(full) - 1):
        with pytest.raises(BrotliError):
            brotli_decompress(full[:cut])


def test_trailing_garbage_raises():
    full = _c(b"payload bytes here")
    with pytest.raises(BrotliParseError, match="trailing"):
        brotli_decompress(full + b"\x00garbage")


def test_bomb_cap_mid_stream():
    data = b"\0" * (1 << 20)
    comp = _c(data, 9)
    with pytest.raises(BrotliBombError):
        brotli_decompress(comp, max_out=1 << 16)


def test_window_sizes_roundtrip():
    # WBITS varies with quality/size; exercise several by size ladder
    rng = random.Random(9)
    for size in (1 << 10, 1 << 15, 1 << 18):
        data = rng.randbytes(size // 2) + b"A" * (size // 2)
        for q in (2, 8):
            assert brotli_decompress(_c(data, q)) == data


# ---------------------------------------------------- dictionary tables
def test_dictionary_table_invariants():
    assert len(DICT_DATA) == 122784
    assert DICT_DATA[:16] == b"timedownlifeleft"
    for ln in range(4, 25):
        nwords = 1 << DICT_SIZE_BITS[ln]
        assert DICT_OFFSETS[ln + 1] == DICT_OFFSETS[ln] + nwords * ln
    assert len(TRANSFORMS) == 121
    # RFC Appendix B first rows
    assert TRANSFORMS[0] == (b"", 0, b"")
    assert TRANSFORMS[1] == (b"", 0, b" ")
    assert TRANSFORMS[3] == (b"", 12, b"")
    assert TRANSFORMS[4] == (b"", 10, b" ")


def test_uppercase_transform_via_differential():
    # capitalized dictionary words at q11 exercise UppercaseFirst
    data = b"Information Development The People System"
    assert brotli_decompress(_c(data, 11)) == data


# -------------------------------------------------------------- fuzz
_FUZZ_BASES = [
    _c(b"the quick brown fox " * 100, 5),
    _c(random.Random(2).randbytes(3000), 1),
    _c(b" ".join([b"time", b"information"] * 100), 11),
]


@settings(max_examples=150, deadline=None)
@given(
    st.integers(0, 2),
    st.integers(0, 2),
    st.integers(0, 1 << 30),
    st.integers(0, 255),
)
def test_hostile_mutations_stay_typed(base_i, op, pos, val):
    """Byte flips/deletes/inserts must raise BrotliError subclasses
    only — the typed-boundary contract of every decoder in this
    repo."""
    blob = bytearray(_FUZZ_BASES[base_i])
    if op == 0:
        blob[pos % len(blob)] = val
    elif op == 1:
        del blob[pos % len(blob)]
    else:
        blob.insert(pos % (len(blob) + 1), val)
    try:
        brotli_decompress(bytes(blob), max_out=1 << 22)
    except BrotliError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_garbage_stays_typed(blob):
    try:
        brotli_decompress(blob, max_out=1 << 22)
    except BrotliError:
        pass


# ---------------------------------------------------- native fast path
class TestNativeFastPath:
    def _native_available(self):
        from data_governance_spark.operators.brotli import _native_lib

        return _native_lib() is not None

    def test_native_parity_on_valid(self):
        from data_governance_spark.operators.brotli import (
            brotli_decompress_auto,
        )

        if not self._native_available():
            pytest.skip("libbrotlidec not resolvable")
        for name, data in _SHAPES.items():
            for q in (1, 8):
                assert brotli_decompress_auto(_c(data, q)) == data, name

    def test_native_failure_falls_back_to_typed(self):
        from data_governance_spark.operators.brotli import (
            brotli_decompress_auto,
        )

        blob = bytearray(_c(b"payload " * 50, 5))
        blob[len(blob) // 2] ^= 0xFF
        with pytest.raises(BrotliError):
            brotli_decompress_auto(bytes(blob))
        with pytest.raises(BrotliError):
            brotli_decompress_auto(_c(b"x") + b"\x00junk")
        with pytest.raises(BrotliError):
            brotli_decompress_auto(_c(b"full stream")[:4])

    def test_native_bomb_cap(self):
        from data_governance_spark.operators.brotli import (
            brotli_decompress_auto,
        )

        with pytest.raises(BrotliBombError):
            brotli_decompress_auto(_c(b"\0" * (1 << 20), 9),
                                   max_out=1 << 12)

    def test_kill_switch_forces_from_spec(self, monkeypatch):
        import data_governance_spark.operators.brotli as m

        monkeypatch.setenv("DG_SPARK_BROTLI_NATIVE", "0")
        monkeypatch.setattr(m, "_NATIVE_CACHE", [])
        assert m._native_lib() is None
        data = b"kill switch payload " * 20
        assert m.brotli_decompress_auto(_c(data)) == data
        monkeypatch.setattr(m, "_NATIVE_CACHE", [])


# ------------------------------------------------- archives integration
def _tar_of(members: dict[str, bytes]) -> bytes:
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, body in members.items():
            ti = tarfile.TarInfo(name)
            ti.size = len(body)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(body))
    return buf.getvalue()


def test_explode_archives_br_hint(spark):
    from data_governance_spark.operators.archives import explode_archives

    tar = _tar_of({"b/one.txt": b"brotli member one",
                   "btwo": b"brotli member two"})
    rows_in = [
        ("tbr", bytearray(_c(tar, 5)), "dump.tar.br"),
        ("gz-mislabel", bytearray(__import__("gzip").compress(b"really gzip")),
         "wrong.br"),  # hint fails -> magic fallback
        ("garbage", bytearray(b"\xff\xfe\xfd" * 30), "junk.br"),
    ]
    df = spark.createDataFrame(
        rows_in, "doc_id string, content binary, path string"
    )
    got = {
        (r["doc_id"], r["member"]): (r["size"], r["content"], r["err"])
        for r in explode_archives(df, path_col="path").collect()
    }
    assert got[("tbr", "b/one.txt")][0] == 17
    assert bytes(got[("tbr", "btwo")][1]) == b"brotli member two"
    assert bytes(got[("gz-mislabel", "-")][1]) == b"really gzip"
    assert got[("garbage", None)][2] == "ArchiveParseError"


def test_explode_archives_without_path_col_unchanged(spark):
    from data_governance_spark.operators.archives import explode_archives

    df = spark.createDataFrame(
        [("g", bytearray(__import__("gzip").compress(b"plain gzip")))],
        "doc_id string, content binary",
    )
    rows = explode_archives(df).collect()
    assert bytes(rows[0]["content"]) == b"plain gzip"
