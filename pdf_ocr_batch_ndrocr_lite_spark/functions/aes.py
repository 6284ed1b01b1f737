"""Pure-stdlib AES (128/256) + CBC + the PDF 2.0 password hash.

The container has no crypto libraries, but the reference reads
AES-encrypted PDFs with an empty user password through pypdf's
``reader.decrypt("")`` (app.py:1180-1189) — without this module every
/V 4-5 (AESV2/AESV3) document a crawl carries would become a
`parse_failure` even though it is freely readable.  This is a textbook
FIPS-197 implementation (S-box generated from the GF(2^8) inverse +
affine transform; encryption through the standard T-table formulation so
the hardened R6 password hash — tens of thousands of blocks per
derivation — stays affordable in Python), used ONLY for PDF standard
security handler work: fixture synthesis and the empty-password decrypt
attempt.  It is not a general-purpose crypto library and makes no
side-channel claims (none are needed: the "secret" is an empty string).

``pdf2_hash`` is ISO 32000-2 Algorithm 2.B (the R6 iterated
SHA-256/384/512 + AES-CBC password hash).  It is lru_cached: fixture
corpora reuse a handful of (password, salt) pairs, so the expensive
derivation runs once per distinct pair, not once per document.
"""

from __future__ import annotations

import hashlib
import struct
from functools import lru_cache
from typing import List, Tuple

# ---------------------------------------------------------------------------
# GF(2^8) tables and the S-box (generated, not transcribed).
# ---------------------------------------------------------------------------


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


_EXP = [0] * 510
_LOG = [0] * 256
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x ^= _xtime(_x)  # multiply by the generator 3 (= x*2 + x)
for _i in range(255, 510):
    _EXP[_i] = _EXP[_i - 255]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _rotl8(v: int, n: int) -> int:
    return ((v << n) | (v >> (8 - n))) & 0xFF


SBOX: List[int] = []
for _i in range(256):
    _q = 0 if _i == 0 else _EXP[255 - _LOG[_i]]  # multiplicative inverse
    SBOX.append(_q ^ _rotl8(_q, 1) ^ _rotl8(_q, 2) ^ _rotl8(_q, 3)
                ^ _rotl8(_q, 4) ^ 0x63)
INV_SBOX = [0] * 256
for _i, _v in enumerate(SBOX):
    INV_SBOX[_v] = _i

# Encryption T-tables: T0[x] = (2s, s, s, 3s) packed big-endian per the
# standard column formulation; T1..T3 are byte rotations of T0.
_T0 = []
for _s in SBOX:
    _T0.append((_gmul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _gmul(_s, 3))
_T1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T0]
_T2 = [((t >> 16) | ((t & 0xFFFF) << 16)) & 0xFFFFFFFF for t in _T0]
_T3 = [((t >> 24) | ((t & 0xFFFFFF) << 8)) & 0xFFFFFFFF for t in _T0]

# Decryption T-tables (the FIPS-197 §5.3.5 equivalent inverse cipher):
# D0[x] = (14·is, 9·is, 13·is, 11·is) packed big-endian with
# is = INV_SBOX[x]; D1..D3 are byte rotations, mirroring _T1.._T3.
_D0 = []
for _x in range(256):
    _is = INV_SBOX[_x]
    _D0.append((_gmul(_is, 14) << 24) | (_gmul(_is, 9) << 16)
               | (_gmul(_is, 13) << 8) | _gmul(_is, 11))
_D1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _D0]
_D2 = [((t >> 16) | ((t & 0xFFFF) << 16)) & 0xFFFFFFFF for t in _D0]
_D3 = [((t >> 24) | ((t & 0xFFFFFF) << 8)) & 0xFFFFFFFF for t in _D0]

_RCON = [0x00, 0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes) -> Tuple[List[int], int]:
    """Round-key WORDS (big-endian u32) + round count (10 for AES-128,
    14 for AES-256)."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError(f"AES key must be 16 or 32 bytes, got {len(key)}")
    nr = nk + 6
    w = [int.from_bytes(key[4 * i:4 * i + 4], "big") for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = ((SBOX[t >> 24] << 24) | (SBOX[(t >> 16) & 0xFF] << 16)
                 | (SBOX[(t >> 8) & 0xFF] << 8) | SBOX[t & 0xFF])
            t ^= _RCON[i // nk] << 24
        elif nk == 8 and i % nk == 4:
            t = ((SBOX[t >> 24] << 24) | (SBOX[(t >> 16) & 0xFF] << 16)
                 | (SBOX[(t >> 8) & 0xFF] << 8) | SBOX[t & 0xFF])
        w.append(w[i - nk] ^ t)
    return w, nr


def _encrypt_block(w: List[int], nr: int, block: bytes) -> bytes:
    s0 = int.from_bytes(block[0:4], "big") ^ w[0]
    s1 = int.from_bytes(block[4:8], "big") ^ w[1]
    s2 = int.from_bytes(block[8:12], "big") ^ w[2]
    s3 = int.from_bytes(block[12:16], "big") ^ w[3]
    T0, T1, T2, T3 = _T0, _T1, _T2, _T3
    for rnd in range(1, nr):
        k = 4 * rnd
        t0 = (T0[s0 >> 24] ^ T1[(s1 >> 16) & 0xFF] ^ T2[(s2 >> 8) & 0xFF]
              ^ T3[s3 & 0xFF] ^ w[k])
        t1 = (T0[s1 >> 24] ^ T1[(s2 >> 16) & 0xFF] ^ T2[(s3 >> 8) & 0xFF]
              ^ T3[s0 & 0xFF] ^ w[k + 1])
        t2 = (T0[s2 >> 24] ^ T1[(s3 >> 16) & 0xFF] ^ T2[(s0 >> 8) & 0xFF]
              ^ T3[s1 & 0xFF] ^ w[k + 2])
        t3 = (T0[s3 >> 24] ^ T1[(s0 >> 16) & 0xFF] ^ T2[(s1 >> 8) & 0xFF]
              ^ T3[s2 & 0xFF] ^ w[k + 3])
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = 4 * nr
    S = SBOX
    o0 = ((S[s0 >> 24] << 24) | (S[(s1 >> 16) & 0xFF] << 16)
          | (S[(s2 >> 8) & 0xFF] << 8) | S[s3 & 0xFF]) ^ w[k]
    o1 = ((S[s1 >> 24] << 24) | (S[(s2 >> 16) & 0xFF] << 16)
          | (S[(s3 >> 8) & 0xFF] << 8) | S[s0 & 0xFF]) ^ w[k + 1]
    o2 = ((S[s2 >> 24] << 24) | (S[(s3 >> 16) & 0xFF] << 16)
          | (S[(s0 >> 8) & 0xFF] << 8) | S[s1 & 0xFF]) ^ w[k + 2]
    o3 = ((S[s3 >> 24] << 24) | (S[(s0 >> 16) & 0xFF] << 16)
          | (S[(s1 >> 8) & 0xFF] << 8) | S[s2 & 0xFF]) ^ w[k + 3]
    return (o0.to_bytes(4, "big") + o1.to_bytes(4, "big")
            + o2.to_bytes(4, "big") + o3.to_bytes(4, "big"))


def _decrypt_block(w: List[int], nr: int, block: bytes) -> bytes:
    # straightforward inverse-round formulation: decryption only touches
    # SMALL payloads (content streams, the 32-byte /UE key blob) — the
    # hot path (the R6 hash) is encryption-only, which is why only the
    # forward cipher gets the T-table treatment
    s = list(block)
    rk = _round_key_bytes(w, nr)
    s = [b ^ k for b, k in zip(s, rk[nr])]
    for rnd in range(nr - 1, 0, -1):
        s = _inv_shift_rows(s)
        s = [INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        s = _inv_mix_columns(s)
    s = _inv_shift_rows(s)
    s = [INV_SBOX[b] for b in s]
    s = [b ^ k for b, k in zip(s, rk[0])]
    return bytes(s)


def _round_key_bytes(w: List[int], nr: int) -> List[List[int]]:
    out = []
    for rnd in range(nr + 1):
        rkb: List[int] = []
        for c in range(4):
            word = w[4 * rnd + c]
            rkb += [word >> 24, (word >> 16) & 0xFF,
                    (word >> 8) & 0xFF, word & 0xFF]
        out.append(rkb)
    return out


def _inv_shift_rows(s: List[int]) -> List[int]:
    return [s[0], s[13], s[10], s[7],
            s[4], s[1], s[14], s[11],
            s[8], s[5], s[2], s[15],
            s[12], s[9], s[6], s[3]]


def _inv_mix_columns(s: List[int]) -> List[int]:
    out = []
    for c in range(4):
        a0, a1, a2, a3 = s[4 * c:4 * c + 4]
        out += [
            _gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13) ^ _gmul(a3, 9),
            _gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11) ^ _gmul(a3, 13),
            _gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14) ^ _gmul(a3, 11),
            _gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9) ^ _gmul(a3, 14),
        ]
    return out


# ---------------------------------------------------------------------------
# Public surface: ECB single block, CBC (with and without PKCS#7), padding.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=64)
def _sched(key: bytes) -> Tuple[tuple, int]:
    w, nr = _expand_key(key)
    return tuple(w), nr


def encrypt_block_ecb(key: bytes, block: bytes) -> bytes:
    w, nr = _sched(key)
    return _encrypt_block(list(w), nr, block)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC, NO padding — len(data) must be a block multiple.

    The whole chain runs on u32 WORDS (one unpack in, one pack out, the
    round loop inlined): the per-block formulation paid bytes<->int
    conversions and a per-byte XOR generator expression per block on top
    of the cipher (measured 1.4x on the R6 hash workload — tens of
    thousands of chained blocks per password derivation; equality
    fuzz-checked against the block-primitive formulation)."""
    if len(data) % 16:
        raise ValueError("cbc_encrypt: data not block-aligned")
    w, nr = _sched(key)
    T0, T1, T2, T3, S = _T0, _T1, _T2, _T3, SBOX
    words = struct.unpack(f">{len(data) // 4}I", data)
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    w0, w1, w2, w3 = w[0], w[1], w[2], w[3]
    kf = 4 * nr
    wkf0, wkf1, wkf2, wkf3 = w[kf], w[kf + 1], w[kf + 2], w[kf + 3]
    out = []
    for i in range(0, len(words), 4):
        s0 = words[i] ^ p0 ^ w0
        s1 = words[i + 1] ^ p1 ^ w1
        s2 = words[i + 2] ^ p2 ^ w2
        s3 = words[i + 3] ^ p3 ^ w3
        for rnd in range(1, nr):
            k = 4 * rnd
            t0 = (T0[s0 >> 24] ^ T1[(s1 >> 16) & 0xFF]
                  ^ T2[(s2 >> 8) & 0xFF] ^ T3[s3 & 0xFF] ^ w[k])
            t1 = (T0[s1 >> 24] ^ T1[(s2 >> 16) & 0xFF]
                  ^ T2[(s3 >> 8) & 0xFF] ^ T3[s0 & 0xFF] ^ w[k + 1])
            t2 = (T0[s2 >> 24] ^ T1[(s3 >> 16) & 0xFF]
                  ^ T2[(s0 >> 8) & 0xFF] ^ T3[s1 & 0xFF] ^ w[k + 2])
            t3 = (T0[s3 >> 24] ^ T1[(s0 >> 16) & 0xFF]
                  ^ T2[(s1 >> 8) & 0xFF] ^ T3[s2 & 0xFF] ^ w[k + 3])
            s0, s1, s2, s3 = t0, t1, t2, t3
        p0 = ((S[s0 >> 24] << 24) | (S[(s1 >> 16) & 0xFF] << 16)
              | (S[(s2 >> 8) & 0xFF] << 8) | S[s3 & 0xFF]) ^ wkf0
        p1 = ((S[s1 >> 24] << 24) | (S[(s2 >> 16) & 0xFF] << 16)
              | (S[(s3 >> 8) & 0xFF] << 8) | S[s0 & 0xFF]) ^ wkf1
        p2 = ((S[s2 >> 24] << 24) | (S[(s3 >> 16) & 0xFF] << 16)
              | (S[(s0 >> 8) & 0xFF] << 8) | S[s1 & 0xFF]) ^ wkf2
        p3 = ((S[s3 >> 24] << 24) | (S[(s0 >> 16) & 0xFF] << 16)
              | (S[(s1 >> 8) & 0xFF] << 8) | S[s2 & 0xFF]) ^ wkf3
        out += (p0, p1, p2, p3)
    return struct.pack(f">{len(out)}I", *out)


def _imc_word(wd: int) -> int:
    """InvMixColumns over one big-endian round-key word (key-schedule
    transform of the equivalent inverse cipher; runs once per key)."""
    a0, a1 = wd >> 24, (wd >> 16) & 0xFF
    a2, a3 = (wd >> 8) & 0xFF, wd & 0xFF
    return (((_gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13)
              ^ _gmul(a3, 9)) << 24)
            | ((_gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11)
                ^ _gmul(a3, 13)) << 16)
            | ((_gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14)
                ^ _gmul(a3, 11)) << 8)
            | (_gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9)
               ^ _gmul(a3, 14)))


@lru_cache(maxsize=64)
def _dsched(key: bytes) -> Tuple[tuple, int]:
    """Round keys for the equivalent inverse cipher: the middle round
    words pass through InvMixColumns; first and last stay plain."""
    w, nr = _sched(key)
    dw = list(w)
    for i in range(4, 4 * nr):
        dw[i] = _imc_word(w[i])
    return tuple(dw), nr


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC, NO padding removal — truncates any ragged tail block
    (tolerant-scanner behavior for corrupt ciphertext).

    Word-based equivalent-inverse-cipher formulation (D-table lookups,
    one unpack in / one pack out), the decrypt twin of `cbc_encrypt`'s
    T-table chain — the byte-list inverse-round form it replaces spent
    its time in per-byte GF(2^8) multiplies (kernel profile, r9);
    equality fuzz-checked against the block-primitive formulation."""
    w, nr = _sched(key)
    dw, _ = _dsched(key)
    n = len(data) - len(data) % 16
    if n == 0:
        return b""
    D0, D1, D2, D3, IS = _D0, _D1, _D2, _D3, INV_SBOX
    words = struct.unpack(f">{n // 4}I", data[:n])
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    kf = 4 * nr
    wkf0, wkf1, wkf2, wkf3 = w[kf], w[kf + 1], w[kf + 2], w[kf + 3]
    w0, w1, w2, w3 = w[0], w[1], w[2], w[3]
    out = []
    for i in range(0, len(words), 4):
        c0, c1, c2, c3 = words[i], words[i + 1], words[i + 2], words[i + 3]
        s0, s1, s2, s3 = c0 ^ wkf0, c1 ^ wkf1, c2 ^ wkf2, c3 ^ wkf3
        for rnd in range(nr - 1, 0, -1):
            k = 4 * rnd
            t0 = (D0[s0 >> 24] ^ D1[(s3 >> 16) & 0xFF]
                  ^ D2[(s2 >> 8) & 0xFF] ^ D3[s1 & 0xFF] ^ dw[k])
            t1 = (D0[s1 >> 24] ^ D1[(s0 >> 16) & 0xFF]
                  ^ D2[(s3 >> 8) & 0xFF] ^ D3[s2 & 0xFF] ^ dw[k + 1])
            t2 = (D0[s2 >> 24] ^ D1[(s1 >> 16) & 0xFF]
                  ^ D2[(s0 >> 8) & 0xFF] ^ D3[s3 & 0xFF] ^ dw[k + 2])
            t3 = (D0[s3 >> 24] ^ D1[(s2 >> 16) & 0xFF]
                  ^ D2[(s1 >> 8) & 0xFF] ^ D3[s0 & 0xFF] ^ dw[k + 3])
            s0, s1, s2, s3 = t0, t1, t2, t3
        out.append(((IS[s0 >> 24] << 24) | (IS[(s3 >> 16) & 0xFF] << 16)
                    | (IS[(s2 >> 8) & 0xFF] << 8) | IS[s1 & 0xFF])
                   ^ w0 ^ p0)
        out.append(((IS[s1 >> 24] << 24) | (IS[(s0 >> 16) & 0xFF] << 16)
                    | (IS[(s3 >> 8) & 0xFF] << 8) | IS[s2 & 0xFF])
                   ^ w1 ^ p1)
        out.append(((IS[s2 >> 24] << 24) | (IS[(s1 >> 16) & 0xFF] << 16)
                    | (IS[(s0 >> 8) & 0xFF] << 8) | IS[s3 & 0xFF])
                   ^ w2 ^ p2)
        out.append(((IS[s3 >> 24] << 24) | (IS[(s2 >> 16) & 0xFF] << 16)
                    | (IS[(s1 >> 8) & 0xFF] << 8) | IS[s0 & 0xFF])
                   ^ w3 ^ p3)
        p0, p1, p2, p3 = c0, c1, c2, c3
    return struct.pack(f">{len(out)}I", *out)


def pkcs7_pad(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def pkcs7_unpad(data: bytes) -> bytes:
    """Strip PKCS#7 padding; malformed padding is returned untouched
    (a tolerant scanner must degrade, not raise)."""
    if not data:
        return data
    n = data[-1]
    if 1 <= n <= 16 and len(data) >= n and data.endswith(bytes([n]) * n):
        return data[:-n]
    return data


# ---------------------------------------------------------------------------
# ISO 32000-2 Algorithm 2.B: the hardened (R6) password hash.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=256)
def pdf2_hash(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """R6 iterated hash: SHA-256 seed, then rounds of AES-128-CBC over
    64 repetitions of (password + K + udata) with the digest algorithm
    (SHA-256/384/512) chosen by the first 16 ciphertext bytes mod 3;
    stops when round >= 64 and the last ciphertext byte <= round - 32.
    Cached: fixture corpora reuse a handful of (password, salt) pairs."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]
