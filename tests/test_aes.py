"""AES primitive (operators/aes.py): FIPS-197 appendix C vectors,
NIST SP 800-38A CBC vectors, a from-spec NAIVE second implementation
for a true two-implementation differential (the T-table production
code vs a per-byte SubBytes/ShiftRows/MixColumns transcription),
round-trip fuzz, and the typed error taxonomy."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_governance_spark.operators.aes import (
    AesError,
    aes_decrypt_block,
    aes_encrypt_block,
    cbc_decrypt,
    cbc_encrypt,
)

# ===================================================================
# independent naive implementation (FIPS-197 transcribed per-byte —
# shares nothing with the module's T-table formulation)
# ===================================================================


def _gmul_t(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


_SBOX_T = bytearray(256)
_inv = {_gmul_t(1, 1): 1}
# build multiplicative inverses by brute force
for _a in range(1, 256):
    for _b in range(1, 256):
        if _gmul_t(_a, _b) == 1:
            _inv[_a] = _b
            break
for _x in range(256):
    _y = _inv.get(_x, 0)
    _r = _y
    for _s in (1, 2, 3, 4):
        _r ^= ((_y << _s) | (_y >> (8 - _s))) & 0xFF
    _SBOX_T[_x] = _r ^ 0x63


def _naive_expand(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i: 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX_T[b] for b in t]
            t[0] ^= rcon
            rcon = _gmul_t(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX_T[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return w


def naive_encrypt_block(key: bytes, block: bytes) -> bytes:
    """FIPS-197 §5.1, state as a 4x4 column-major byte matrix."""
    w = _naive_expand(key)
    nr = len(w) // 4 - 1
    # state[r][c]; input byte 4c+r -> state[r][c]
    st_ = [[block[4 * c + r] for c in range(4)] for r in range(4)]

    def add_round_key(rnd):
        for c in range(4):
            for r in range(4):
                st_[r][c] ^= w[4 * rnd + c][r]

    add_round_key(0)
    for rnd in range(1, nr + 1):
        for r in range(4):
            for c in range(4):
                st_[r][c] = _SBOX_T[st_[r][c]]
        for r in range(1, 4):
            st_[r] = st_[r][r:] + st_[r][:r]  # ShiftRows
        if rnd != nr:
            for c in range(4):
                a = [st_[r][c] for r in range(4)]
                st_[0][c] = (_gmul_t(a[0], 2) ^ _gmul_t(a[1], 3)
                             ^ a[2] ^ a[3])
                st_[1][c] = (a[0] ^ _gmul_t(a[1], 2)
                             ^ _gmul_t(a[2], 3) ^ a[3])
                st_[2][c] = (a[0] ^ a[1] ^ _gmul_t(a[2], 2)
                             ^ _gmul_t(a[3], 3))
                st_[3][c] = (_gmul_t(a[0], 3) ^ a[1] ^ a[2]
                             ^ _gmul_t(a[3], 2))
        add_round_key(rnd)
    return bytes(st_[r][c] for c in range(4) for r in range(4))


# ===================================================================
# published vectors
# ===================================================================
_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_FIPS = [
    ("000102030405060708090a0b0c0d0e0f",
     "69c4e0d86a7b0430d8cdb78070b4c55a"),
    ("000102030405060708090a0b0c0d0e0f1011121314151617",
     "dda97ca4864cdfe06eaf70a0ec0d7191"),
    ("000102030405060708090a0b0c0d0e0f"
     "101112131415161718191a1b1c1d1e1f",
     "8ea2b7ca516745bfeafc49904b496089"),
]


class TestVectors:
    @pytest.mark.parametrize("key,ct", _FIPS)
    def test_fips197_appendix_c(self, key, ct):
        k = bytes.fromhex(key)
        assert aes_encrypt_block(k, _PT).hex() == ct
        assert aes_decrypt_block(k, bytes.fromhex(ct)) == _PT
        assert naive_encrypt_block(k, _PT).hex() == ct  # writer too

    def test_sp800_38a_cbc_aes128(self):
        key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
        iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex(
            "6bc1bee22e409f96e93d7e117393172a"
            "ae2d8a571e03ac9c9eb76fac45af8e51"
            "30c81c46a35ce411e5fbc1191a0a52ef"
            "f69f2445df4f9b17ad2b417be66c3710"
        )
        ct = bytes.fromhex(
            "7649abac8119b246cee98e9b12e9197d"
            "5086cb9b507219ee95db113a917678b2"
            "73bed6b8e3c1743b7116e69e22229516"
            "3ff1caa1681fac09120eca307586e1a7"
        )
        assert cbc_encrypt(key, iv, pt) == ct
        assert cbc_decrypt(key, iv, ct) == pt

    def test_sp800_38a_cbc_aes256(self):
        key = bytes.fromhex(
            "603deb1015ca71be2b73aef0857d7781"
            "1f352c073b6108d72d9810a30914dff4"
        )
        iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
        ct = bytes.fromhex("f58c4c04d6e5f1ba779eabfb5f7bfbd6")
        assert cbc_encrypt(key, iv, pt) == ct
        assert cbc_decrypt(key, iv, ct) == pt


class TestDifferentialAndFuzz:
    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=16, max_size=16),
           st.sampled_from([16, 24, 32]), st.data())
    def test_tables_match_naive_spec(self, block, klen, data):
        key = data.draw(st.binary(min_size=klen, max_size=klen))
        assert aes_encrypt_block(key, block) == \
            naive_encrypt_block(key, block)

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=16, max_size=16),
           st.binary(min_size=16, max_size=16),
           st.integers(0, 8), st.data())
    def test_cbc_round_trip(self, key, iv, nblocks, data):
        pt = data.draw(st.binary(min_size=16 * nblocks,
                                 max_size=16 * nblocks))
        assert cbc_decrypt(key, iv, cbc_encrypt(key, iv, pt)) == pt

    def test_decrypt_inverts_encrypt_all_key_sizes(self):
        blk = bytes(range(16))
        for klen in (16, 24, 32):
            key = bytes(range(klen))
            assert aes_decrypt_block(key, aes_encrypt_block(key, blk)) \
                == blk


class TestErrors:
    def test_typed_errors(self):
        with pytest.raises(AesError, match="key"):
            aes_encrypt_block(b"short", bytes(16))
        with pytest.raises(AesError, match="block"):
            aes_encrypt_block(bytes(16), b"tiny")
        with pytest.raises(AesError, match="block"):
            aes_decrypt_block(bytes(16), bytes(17))
        with pytest.raises(AesError, match="IV"):
            cbc_encrypt(bytes(16), b"x", bytes(16))
        with pytest.raises(AesError, match="multiple"):
            cbc_encrypt(bytes(16), bytes(16), bytes(17))
        with pytest.raises(AesError, match="multiple"):
            cbc_decrypt(bytes(16), bytes(16), bytes(31))
