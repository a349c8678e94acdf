"""AES-128/192/256 block cipher + CBC mode, pure Python, from the
public FIPS-197 specification.

Why this exists: the PDF standard security handler's AESV2 (V=4/R=4)
and AESV3 (V=5/R=5,6) crypt filters are the second-most-common
encrypted class in crawled corpora after rev 2/3 RC4 (which
``operators/pdf.py`` already decrypts), and Python's stdlib ships no
AES.  This container has no pycryptodome/cryptography wheels, so the
honest choices were a typed ``PdfEncryptedError`` boundary or a
from-spec implementation to the repo's test standard — this module is
the latter, pinned against the FIPS-197 appendix and NIST SP 800-38A
CBC vectors in ``tests/test_aes.py``, with round-trip fuzz.

Implementation notes (all public knowledge):

- encryption/decryption use the standard 8-bit T-table formulation
  (four 256-entry tables each way, the "equivalent inverse cipher" of
  FIPS-197 §5.3.5 for decryption) — the fastest shape pure Python
  allows, ~100× fewer ops than a naive per-byte MixColumns;
- the S-box is GENERATED at import from its definition (multiplicative
  inverse in GF(2^8) + the affine map) rather than pasted, so the
  tables are self-evidently from-spec;
- throughput is measured, not guessed: ~1 MB/s per core (see
  ``tests/test_aes.py``'s budget assertions and DEPLOY.md) — fine for
  PDF payloads, which decrypt lazily per-stream and are capped by the
  ingest tier's per-document work budget.

Security caveat (stated): this is a DECODER for already-public
crawled bytes, not a vault.  Pure-Python table lookups are not
constant-time; do not use this module to encrypt secrets.
"""

from __future__ import annotations

__all__ = [
    "AesError",
    "aes_encrypt_block",
    "aes_decrypt_block",
    "cbc_encrypt",
    "cbc_decrypt",
    "expand_key",
]


class AesError(ValueError):
    """Typed failure: bad key/iv/data length."""


# ---------------------------------------------------------------------
# S-box, generated from the FIPS-197 definition
# ---------------------------------------------------------------------
def _gf_mul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B  # x^8 + x^4 + x^3 + x + 1
        b >>= 1
    return p


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse via exhaustive table (GF(2^8) is tiny)
    inv = [0] * 256
    for a in range(1, 256):
        for b in range(1, 256):
            if _gf_mul(a, b) == 1:
                inv[a] = b
                break
    sbox = bytearray(256)
    for x in range(256):
        y = inv[x]
        # affine transformation: b ^= rot(b,4)^rot(b,5)^rot(b,6)^rot(b,7) ^ 0x63
        r = y
        for shift in (1, 2, 3, 4):
            r ^= ((y << shift) | (y >> (8 - shift))) & 0xFF
        sbox[x] = r ^ 0x63
    inv_sbox = bytearray(256)
    for x in range(256):
        inv_sbox[sbox[x]] = x
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()

# round constants: rcon[i] = x^(i-1) in GF(2^8)
_RCON = [0, 1]
while len(_RCON) < 15:
    _RCON.append(_gf_mul(_RCON[-1], 2))


# ---------------------------------------------------------------------
# T-tables.  Encryption: MixColumns coefficient column for input row r;
# decryption: InvMixColumns over the inverse S-box (equivalent inverse
# cipher).  Words are big-endian: byte 0 of a state column is the MSB.
# ---------------------------------------------------------------------
def _pack(c0: int, c1: int, c2: int, c3: int, s: int) -> int:
    return (
        (_gf_mul(c0, s) << 24)
        | (_gf_mul(c1, s) << 16)
        | (_gf_mul(c2, s) << 8)
        | _gf_mul(c3, s)
    )


_TE = []
for coeffs in ((2, 1, 1, 3), (3, 2, 1, 1), (1, 3, 2, 1), (1, 1, 3, 2)):
    _TE.append(tuple(_pack(*coeffs, _SBOX[x]) for x in range(256)))
_TD = []
for coeffs in ((14, 9, 13, 11), (11, 14, 9, 13), (13, 11, 14, 9),
               (9, 13, 11, 14)):
    _TD.append(tuple(_pack(*coeffs, _INV_SBOX[x]) for x in range(256)))
_TE0, _TE1, _TE2, _TE3 = _TE
_TD0, _TD1, _TD2, _TD3 = _TD


def expand_key(key: bytes) -> list[int]:
    """FIPS-197 §5.2 key schedule: the encryption round keys as
    4*(rounds+1) big-endian words."""
    if len(key) not in (16, 24, 32):
        raise AesError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    nk = len(key) // 4
    nr = nk + 6
    w = [int.from_bytes(key[4 * i: 4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (  # SubWord
                (_SBOX[t >> 24] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
            t ^= _RCON[i // nk] << 24
        elif nk > 6 and i % nk == 4:
            t = (
                (_SBOX[t >> 24] << 24)
                | (_SBOX[(t >> 16) & 0xFF] << 16)
                | (_SBOX[(t >> 8) & 0xFF] << 8)
                | _SBOX[t & 0xFF]
            )
        w.append(w[i - nk] ^ t)
    return w


def _inv_round_keys(w: list[int]) -> list[int]:
    """Equivalent-inverse-cipher schedule: reverse the rounds and run
    the middle round keys through InvMixColumns (FIPS-197 §5.3.5).
    ``_TD0[_SBOX[b]]`` is exactly InvMixColumns applied to byte b in
    row 0 (the inv-sbox inside TD cancels against the forward sbox)."""
    nr = len(w) // 4 - 1
    dk = list(w[4 * nr: 4 * nr + 4])
    for rnd in range(nr - 1, 0, -1):
        for j in range(4):
            t = w[4 * rnd + j]
            dk.append(
                _TD0[_SBOX[t >> 24]]
                ^ _TD1[_SBOX[(t >> 16) & 0xFF]]
                ^ _TD2[_SBOX[(t >> 8) & 0xFF]]
                ^ _TD3[_SBOX[t & 0xFF]]
            )
    dk.extend(w[0:4])
    return dk


def _encrypt_block_w(w: list[int], block: bytes) -> bytes:
    nr = len(w) // 4 - 1
    s0 = int.from_bytes(block[0:4], "big") ^ w[0]
    s1 = int.from_bytes(block[4:8], "big") ^ w[1]
    s2 = int.from_bytes(block[8:12], "big") ^ w[2]
    s3 = int.from_bytes(block[12:16], "big") ^ w[3]
    k = 4
    for _ in range(nr - 1):
        t0 = (_TE0[s0 >> 24] ^ _TE1[(s1 >> 16) & 0xFF]
              ^ _TE2[(s2 >> 8) & 0xFF] ^ _TE3[s3 & 0xFF] ^ w[k])
        t1 = (_TE0[s1 >> 24] ^ _TE1[(s2 >> 16) & 0xFF]
              ^ _TE2[(s3 >> 8) & 0xFF] ^ _TE3[s0 & 0xFF] ^ w[k + 1])
        t2 = (_TE0[s2 >> 24] ^ _TE1[(s3 >> 16) & 0xFF]
              ^ _TE2[(s0 >> 8) & 0xFF] ^ _TE3[s1 & 0xFF] ^ w[k + 2])
        t3 = (_TE0[s3 >> 24] ^ _TE1[(s0 >> 16) & 0xFF]
              ^ _TE2[(s1 >> 8) & 0xFF] ^ _TE3[s2 & 0xFF] ^ w[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    sb = _SBOX
    out = bytearray(16)
    for j, (a, b, c, d) in enumerate(
        ((s0, s1, s2, s3), (s1, s2, s3, s0),
         (s2, s3, s0, s1), (s3, s0, s1, s2))
    ):
        word = (
            (sb[a >> 24] << 24)
            | (sb[(b >> 16) & 0xFF] << 16)
            | (sb[(c >> 8) & 0xFF] << 8)
            | sb[d & 0xFF]
        ) ^ w[k + j]
        out[4 * j: 4 * j + 4] = word.to_bytes(4, "big")
    return bytes(out)


def _decrypt_block_w(dk: list[int], block: bytes) -> bytes:
    nr = len(dk) // 4 - 1
    s0 = int.from_bytes(block[0:4], "big") ^ dk[0]
    s1 = int.from_bytes(block[4:8], "big") ^ dk[1]
    s2 = int.from_bytes(block[8:12], "big") ^ dk[2]
    s3 = int.from_bytes(block[12:16], "big") ^ dk[3]
    k = 4
    for _ in range(nr - 1):
        t0 = (_TD0[s0 >> 24] ^ _TD1[(s3 >> 16) & 0xFF]
              ^ _TD2[(s2 >> 8) & 0xFF] ^ _TD3[s1 & 0xFF] ^ dk[k])
        t1 = (_TD0[s1 >> 24] ^ _TD1[(s0 >> 16) & 0xFF]
              ^ _TD2[(s3 >> 8) & 0xFF] ^ _TD3[s2 & 0xFF] ^ dk[k + 1])
        t2 = (_TD0[s2 >> 24] ^ _TD1[(s1 >> 16) & 0xFF]
              ^ _TD2[(s0 >> 8) & 0xFF] ^ _TD3[s3 & 0xFF] ^ dk[k + 2])
        t3 = (_TD0[s3 >> 24] ^ _TD1[(s2 >> 16) & 0xFF]
              ^ _TD2[(s1 >> 8) & 0xFF] ^ _TD3[s0 & 0xFF] ^ dk[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    ib = _INV_SBOX
    out = bytearray(16)
    for j, (a, b, c, d) in enumerate(
        ((s0, s3, s2, s1), (s1, s0, s3, s2),
         (s2, s1, s0, s3), (s3, s2, s1, s0))
    ):
        word = (
            (ib[a >> 24] << 24)
            | (ib[(b >> 16) & 0xFF] << 16)
            | (ib[(c >> 8) & 0xFF] << 8)
            | ib[d & 0xFF]
        ) ^ dk[k + j]
        out[4 * j: 4 * j + 4] = word.to_bytes(4, "big")
    return bytes(out)


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block through the forward cipher."""
    if len(block) != 16:
        raise AesError(f"block must be 16 bytes, got {len(block)}")
    return _encrypt_block_w(expand_key(key), block)


def aes_decrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block through the inverse cipher."""
    if len(block) != 16:
        raise AesError(f"block must be 16 bytes, got {len(block)}")
    return _decrypt_block_w(_inv_round_keys(expand_key(key)), block)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC over ``data`` (length must already be a multiple of 16 —
    padding policy belongs to the caller: PDF uses PKCS#5/7, the
    AESV3 key wrap uses none)."""
    if len(iv) != 16:
        raise AesError(f"IV must be 16 bytes, got {len(iv)}")
    if len(data) % 16:
        raise AesError(f"CBC data length {len(data)} not a multiple of 16")
    w = expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(x ^ y for x, y in zip(data[i: i + 16], prev))
        prev = _encrypt_block_w(w, blk)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC inverse; same no-padding contract as :func:`cbc_encrypt`."""
    if len(iv) != 16:
        raise AesError(f"IV must be 16 bytes, got {len(iv)}")
    if len(data) % 16:
        raise AesError(f"CBC data length {len(data)} not a multiple of 16")
    dk = _inv_round_keys(expand_key(key))
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        ct = data[i: i + 16]
        blk = _decrypt_block_w(dk, ct)
        out += bytes(x ^ y for x, y in zip(blk, prev))
        prev = ct
    return bytes(out)
