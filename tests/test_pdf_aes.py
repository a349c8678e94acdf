"""AES-encrypted PDFs (operators/pdf.py V=4 AESV2 / V=5 AESV3):
an independent spec writer (ISO 32000-1 §7.6.3 + ISO 32000-2 §7.6.4
transcribed here, using the NIST-pinned naive AES from test_aes.py,
NOT the production T-table module) encrypts one-page documents, and
``pdf_text`` must decrypt and extract them — the same differential
pattern as the suite's RC4/LZW/PNG/FLAC spec writers.

Covers: AESV2 (plain + Flate chain + /EncryptMetadata false + split
/StrF Identity), V2-under-V4 (RC4 wrapped in crypt filters), AESV3
R=5 and R=6 (empty user password), the R=6 empty-OWNER-password
fallback, real-password + unknown-CFM typed raises, and hostile AES
payload totality."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.pdf import (
    PdfEncryptedError,
    pdf_text,
)
from test_aes import naive_encrypt_block
from test_pdf import HELLO, build_pdf, stream_body
from test_pdf import ENC_PAD_T, rc4_t, std_keys_t

_IV = bytes(range(0xA0, 0xB0))  # fixed IV: deterministic payloads


def cbc_encrypt_t(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC over the NAIVE block cipher — independent of the module."""
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[i: i + 16], prev))
        prev = naive_encrypt_block(key, blk)
        out += prev
    return bytes(out)


def aes_payload_t(key: bytes, data: bytes, iv: bytes = _IV) -> bytes:
    """IV || CBC(PKCS#5-padded data) — the AESV2/AESV3 string/stream
    shape (ISO 32000-1 §7.6.2)."""
    pad = 16 - len(data) % 16
    return iv + cbc_encrypt_t(key, iv, data + bytes([pad]) * pad)


def objkey_aesv2_t(key: bytes, num: int, gen: int = 0) -> bytes:
    h = hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        + b"sAlT"
    ).digest()
    return h[: min(len(key) + 5, 16)]


# ===================================================================
# V=4 writer (crypt filters)
# ===================================================================
def v4_pdf(
    content: bytes = HELLO,
    cfm: str = "AESV2",
    user_pwd: bytes = b"",
    compress: bool = False,
    encrypt_metadata: bool = True,
    strf: str = "StdCF",
    extra_string: bytes | None = None,
    id0: bytes = b"\xab\xcd\x12\x34" * 4,
    perms: int = -44,
) -> bytes:
    """One-page V=4/R=4 encrypted PDF.  Key derivation reuses the
    suite's rev-3 transcription (R=4 uses the same Algorithms 2/3/5)
    plus the /EncryptMetadata step-f tail."""
    # Algorithm 2 with the R4 EncryptMetadata tail: recompute /O via
    # std_keys_t (O doesn't depend on it), then the key by hand
    _, o, u3 = std_keys_t(user_pwd, b"owner-secret", perms, id0, 3, 128)
    upad = (user_pwd + ENC_PAD_T)[:32]
    h = hashlib.md5(
        upad + o + struct.pack("<i", perms) + id0
        + (b"" if encrypt_metadata else b"\xff\xff\xff\xff")
    ).digest()
    for _ in range(50):
        h = hashlib.md5(h[:16]).digest()
    key = h[:16]
    # Algorithm 5 /U from THIS key
    uu = rc4_t(key, hashlib.md5(ENC_PAD_T + id0).digest())
    for i in range(1, 20):
        uu = rc4_t(bytes(b ^ i for b in key), uu)
    u = uu + bytes(16)

    data = zlib.compress(content) if compress else content
    k4 = (objkey_aesv2_t(key, 4) if cfm == "AESV2"
          else rc4_obj_key_t(key, 4))
    edata = (aes_payload_t(k4, data) if cfm == "AESV2"
             else rc4_t(k4, data))
    em = b"" if encrypt_metadata else b" /EncryptMetadata false"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(
            b"/Filter /FlateDecode" if compress else b"", edata
        ),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: (
            f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P {perms} "
            f"/CF << /StdCF << /CFM /{cfm} /AuthEvent /DocOpen "
            f"/Length 16 >> >> /StmF /StdCF /StrF /{strf} "
            f"/O <{o.hex()}> /U <{u.hex()}>"
        ).encode() + em + b" >>",
    }
    if extra_string is not None:
        if strf == "StdCF":
            s = (aes_payload_t(objkey_aesv2_t(key, 7), extra_string)
                 if cfm == "AESV2"
                 else rc4_t(rc4_obj_key_t(key, 7), extra_string))
        else:
            s = extra_string  # Identity: strings stay plaintext
        objs[7] = b"<< /Marker <" + s.hex().encode() + b"> >>"
    idhex = id0.hex().encode()
    return build_pdf(
        objs,
        b"<< /Size 9 /Root 1 0 R /Encrypt 6 0 R /ID [<"
        + idhex + b"> <" + idhex + b">] >>",
    )


def rc4_obj_key_t(key: bytes, num: int, gen: int = 0) -> bytes:
    h = hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()
    return h[: min(len(key) + 5, 16)]


# ===================================================================
# V=5 writer (AESV3)
# ===================================================================
def hash_2b_t(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B over the naive cipher."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = cbc_encrypt_t(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


_FILE_KEY = bytes(range(0x40, 0x60))  # fixed 32-byte file key


import functools


@functools.lru_cache(maxsize=None)  # the naive 2.B hash is slow
def v5_pdf(
    content: bytes = HELLO,
    r: int = 6,
    user_pwd: bytes = b"",
    owner_pwd: bytes = b"",
    file_key: bytes = _FILE_KEY,
) -> bytes:
    """One-page V=5 AESV3 PDF per ISO 32000-2 §7.6.4: /U from the
    user password (+validation/key salts), /UE wraps the file key
    under the user intermediate key; /O //OE hash over U[0:48]."""
    hashed = (lambda p, s, u=b"": hashlib.sha256(p + s + u).digest()) \
        if r == 5 else hash_2b_t
    uvs, uks = b"uVALSALT", b"uKEYSALT"
    ovs, oks = b"oVALSALT", b"oKEYSALT"
    u = hashed(user_pwd, uvs) + uvs + uks
    ue = cbc_encrypt_t(hashed(user_pwd, uks), bytes(16), file_key)
    o = hashed(owner_pwd, ovs, u[:48]) + ovs + oks
    oe = cbc_encrypt_t(hashed(owner_pwd, oks, u[:48]), bytes(16),
                       file_key)
    edata = aes_payload_t(file_key, content)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        4: stream_body(b"", edata),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: (
            f"<< /Filter /Standard /V 5 /R {r} /Length 256 /P -44 "
            f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/O <{o.hex()}> /U <{u.hex()}> "
            f"/OE <{oe.hex()}> /UE <{ue.hex()}> >>"
        ).encode(),
    }
    return build_pdf(objs, b"<< /Size 9 /Root 1 0 R /Encrypt 6 0 R >>")


# ===================================================================
# tests
# ===================================================================
class TestAesV2:
    def test_extracts(self):
        assert pdf_text(v4_pdf()) == "Hello World"

    def test_decrypt_before_inflate(self):
        assert pdf_text(v4_pdf(compress=True)) == "Hello World"

    def test_encrypt_metadata_false_key_tail(self):
        assert pdf_text(v4_pdf(encrypt_metadata=False)) == "Hello World"

    def test_v2_rc4_under_crypt_filters(self):
        assert pdf_text(v4_pdf(cfm="V2")) == "Hello World"
        assert pdf_text(v4_pdf(cfm="V2", compress=True)) == "Hello World"

    def test_strf_identity_leaves_strings_plain(self):
        # streams encrypted (text still extracts), strings Identity
        pdf = v4_pdf(strf="Identity", extra_string=b"plain-marker")
        assert pdf_text(pdf) == "Hello World"
        assert b"plain-marker".hex().encode() in pdf

    def test_real_password_raises_typed(self):
        with pytest.raises(PdfEncryptedError, match="password"):
            pdf_text(v4_pdf(user_pwd=b"secret"))

    def test_unknown_cfm_raises_typed(self):
        with pytest.raises(PdfEncryptedError, match="crypt filter"):
            pdf_text(v4_pdf(cfm="AESV9"))

    def test_short_length_aesv2_typed_not_aeserror(self):
        """r13 review repro: a hostile V4/AESV2 file declaring
        /Length 40 whose /U AUTHENTICATES for the 5-byte key made
        Algorithm 1 emit a 10-byte object key — not an AES key size —
        and the AesError escaped the Pdf taxonomy on the executor.
        Must be typed PdfEncryptedError."""
        id0 = b"\xab\xcd\x12\x34" * 4
        perms = -44
        _, o, _ = std_keys_t(b"", b"owner-secret", perms, id0, 3, 40)
        upad = ENC_PAD_T[:32]
        h = hashlib.md5(upad + o + struct.pack("<i", perms)
                        + id0).digest()
        for _ in range(50):
            h = hashlib.md5(h[:5]).digest()
        key = h[:5]
        uu = rc4_t(key, hashlib.md5(ENC_PAD_T + id0).digest())
        for i in range(1, 20):
            uu = rc4_t(bytes(b ^ i for b in key), uu)
        u = uu + bytes(16)
        from test_pdf import build_pdf as _bp, stream_body as _sb

        objs = {
            1: b"<< /Type /Catalog /Pages 2 0 R >>",
            2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            3: (b"<< /Type /Page /Parent 2 0 R /Resources "
                b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
            4: _sb(b"", b"ciphertext-not-real-" + bytes(32)),
            5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
            6: (f"<< /Filter /Standard /V 4 /R 4 /Length 40 /P {perms} "
                f"/CF << /StdCF << /CFM /AESV2 >> >> /StmF /StdCF "
                f"/StrF /StdCF /O <{o.hex()}> /U <{u.hex()}> >>"
                ).encode(),
        }
        idhex = id0.hex().encode()
        pdf = _bp(objs, b"<< /Size 9 /Root 1 0 R /Encrypt 6 0 R /ID [<"
                  + idhex + b"> <" + idhex + b">] >>")
        with pytest.raises(PdfEncryptedError, match="128"):
            pdf_text(pdf)


class TestAesV3:
    def test_r6_extracts(self):
        assert pdf_text(v5_pdf(r=6)) == "Hello World"

    def test_r5_extracts(self):
        assert pdf_text(v5_pdf(r=5)) == "Hello World"

    def test_r6_owner_password_fallback(self):
        # user password real, owner empty: the /O //OE path must open it
        assert pdf_text(v5_pdf(r=6, user_pwd=b"usersecret")) == \
            "Hello World"

    def test_both_passwords_real_raises_typed(self):
        with pytest.raises(PdfEncryptedError, match="password"):
            pdf_text(v5_pdf(r=6, user_pwd=b"u", owner_pwd=b"o"))

    def test_malformed_u_raises_typed(self):
        pdf = v5_pdf(r=6).replace(b"/U <", b"/U <00> %")
        with pytest.raises(PdfEncryptedError):
            pdf_text(pdf)


def test_gate_aes_payload_pin():
    """The q41 'pdf' planted AESV2 payload (r13): regenerate from this
    suite's independent spec writer and pin bytes + extracted text."""
    from data_governance_spark.queries.sink_source_gates import (
        _PDF_AES_HEX,
        _PDF_AES_TEXT,
    )

    assert pdf_text(bytes.fromhex(_PDF_AES_HEX)) == _PDF_AES_TEXT
    content = (
        b"BT /F1 12 Tf 72 720 Td (AESV2 empty-password decrypt) Tj "
        b"0 -14 Td [(crypt) -260 (filter tier)] TJ ET"
    )
    assert v4_pdf(content=content, compress=True).hex() == _PDF_AES_HEX


class TestHostilePayloads:
    def test_short_and_ragged_ciphertext_total(self):
        from data_governance_spark.operators.pdf import _aes_decrypt_pdf

        key = bytes(16)
        assert _aes_decrypt_pdf(key, b"") == b""
        assert _aes_decrypt_pdf(key, bytes(16)) == b""  # IV only
        assert _aes_decrypt_pdf(key, bytes(17)) == b""  # ragged tail
        # 1 full block with garbage padding byte: kept, not stripped
        out = _aes_decrypt_pdf(key, bytes(35))
        assert isinstance(out, bytes)

    @settings(max_examples=80, deadline=None)
    @given(st.binary(max_size=128), st.binary(min_size=16, max_size=16))
    def test_fuzz_never_raises(self, data, key):
        from data_governance_spark.operators.pdf import _aes_decrypt_pdf

        out = _aes_decrypt_pdf(key, data)
        assert isinstance(out, bytes)

    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 10**9), st.integers(0, 255))
    def test_corrupted_encrypted_pdf_only_typed(self, pos, val):
        from data_governance_spark.operators.pdf import PdfError

        d = bytearray(v4_pdf())
        d[pos % len(d)] = val
        try:
            pdf_text(bytes(d))
        except PdfError:
            pass
