"""AES-128/192/256 + CBC, from the public FIPS-197 specification.

Used by the PDF standard-security-handler (stages/pdf.py: /AESV2 and
/AESV3 crypt filters, ISO 32000 §7.6) and the synthetic encrypted-PDF
writer. The sandbox has no crypto libs, so this is self-contained:

* tables (S-box, inverse, GF(2^8) multiply) are GENERATED at import
  from the spec's definitions (multiplicative inverse + affine
  transform) — nothing hardcoded to mistype; the FIPS-197 appendix
  vectors pin correctness in tests.
* ``decrypt_cbc`` is numpy-vectorized ACROSS blocks — CBC decryption
  has no inter-block dependency (pt_i = D(ct_i) ^ ct_{i-1}), so one
  gather/XOR pipeline handles an entire stream at once. That is the
  direction corpus-scale extraction pays for; encryption (synthesis +
  the Algorithm-2.B hasher) stays scalar — it is inherently serial in
  CBC and runs on few-KB inputs only.

A production build swaps a native cipher behind the same four
functions.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "expand_key",
    "encrypt_block",
    "encrypt_cbc",
    "decrypt_cbc",
    "pad16",
]


def _xtime(x: int) -> int:
    return ((x << 1) ^ (0x1B if x & 0x80 else 0)) & 0xFF


def _make_tables():
    # exp/log over GF(2^8) with generator 3 (x·3 = x ^ xtime(x))
    exp = [0] * 255
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= _xtime(x)

    def inv(a: int) -> int:
        return 0 if a == 0 else exp[(255 - log[a]) % 255]

    def rotl8(b: int, n: int) -> int:
        return ((b << n) | (b >> (8 - n))) & 0xFF

    sbox = [0] * 256
    for i in range(256):
        b = inv(i)
        sbox[i] = (
            b ^ rotl8(b, 1) ^ rotl8(b, 2) ^ rotl8(b, 3) ^ rotl8(b, 4) ^ 0x63
        )
    inv_sbox = [0] * 256
    for i, s in enumerate(sbox):
        inv_sbox[s] = i

    def gmul(a: int, b: int) -> int:
        if a == 0 or b == 0:
            return 0
        return exp[(log[a] + log[b]) % 255]

    mul = {
        n: np.array([gmul(n, i) for i in range(256)], dtype=np.uint8)
        for n in (2, 3, 9, 11, 13, 14)
    }
    return (
        np.array(sbox, dtype=np.uint8),
        np.array(inv_sbox, dtype=np.uint8),
        mul,
    )


_SBOX, _INV_SBOX, _MUL = _make_tables()
_RCON = [0x01]
while len(_RCON) < 14:
    _RCON.append(_xtime(_RCON[-1]))

# Encryption T-tables (the classic public round-function fusion:
# SubBytes+ShiftRows+MixColumns as four 256-entry 32-bit lookups).
# Column packing is big-endian rows: col = r0<<24 | r1<<16 | r2<<8 | r3.
_S_L = [int(x) for x in _SBOX]
_M2, _M3 = [int(x) for x in _MUL[2]], [int(x) for x in _MUL[3]]
_T0 = [(_M2[s] << 24) | (s << 16) | (s << 8) | _M3[s] for s in _S_L]
_T1 = [(_M3[s] << 24) | (_M2[s] << 16) | (s << 8) | s for s in _S_L]
_T2 = [(s << 24) | (_M3[s] << 16) | (_M2[s] << 8) | s for s in _S_L]
_T3 = [(s << 24) | (s << 16) | (_M3[s] << 8) | _M2[s] for s in _S_L]

# ShiftRows as a flat-index permutation: state byte i sits at
# (row, col) = (i % 4, i // 4); row r rotates LEFT by r columns, so
# out[4c+r] = in[4((c+r)%4)+r]; InvShiftRows is the inverse gather.
_SHIFT = np.array(
    [4 * ((c + r) % 4) + r for c in range(4) for r in range(4)], dtype=np.intp
)
_INV_SHIFT = np.empty(16, dtype=np.intp)
_INV_SHIFT[_SHIFT] = np.arange(16)


def expand_key(key: bytes) -> list[bytes]:
    """FIPS-197 §5.2 → list of Nr+1 16-byte round keys."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("key must be 16/24/32 bytes")
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [int(_SBOX[b]) for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [
        bytes(sum((w[4 * r + c] for c in range(4)), []))
        for r in range(nr + 1)
    ]


def _pack_keys(round_keys: list[bytes]) -> list[list[int]]:
    return [
        [int.from_bytes(rk[i : i + 4], "big") for i in (0, 4, 8, 12)]
        for rk in round_keys
    ]


def _encrypt_cols(pk: list[list[int]], c: list[int]) -> list[int]:
    """One block over packed columns (col = r0<<24|r1<<16|r2<<8|r3)."""
    c = [a ^ b for a, b in zip(c, pk[0])]
    for k in pk[1:-1]:
        c = [
            _T0[c[j] >> 24]
            ^ _T1[(c[(j + 1) & 3] >> 16) & 0xFF]
            ^ _T2[(c[(j + 2) & 3] >> 8) & 0xFF]
            ^ _T3[c[(j + 3) & 3] & 0xFF]
            ^ k[j]
            for j in range(4)
        ]
    k = pk[-1]
    return [
        (
            (_S_L[c[j] >> 24] << 24)
            | (_S_L[(c[(j + 1) & 3] >> 16) & 0xFF] << 16)
            | (_S_L[(c[(j + 2) & 3] >> 8) & 0xFF] << 8)
            | _S_L[c[(j + 3) & 3] & 0xFF]
        )
        ^ k[j]
        for j in range(4)
    ]


def encrypt_block(round_keys: list[bytes], block: bytes) -> bytes:
    """Scalar single-block encrypt (synthesis / Algorithm 2.B only)."""
    cols = [int.from_bytes(block[i : i + 4], "big") for i in (0, 4, 8, 12)]
    out = _encrypt_cols(_pack_keys(round_keys), cols)
    return b"".join(x.to_bytes(4, "big") for x in out)


def pad16(data: bytes) -> bytes:
    """PKCS#7 / RFC 2898 padding to a 16-byte multiple (always adds)."""
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def encrypt_cbc(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """CBC encrypt; caller pads (``pad16``) unless the length is already
    a block multiple AND no-padding is intended (Algorithm 2.B)."""
    if len(plaintext) % 16:
        raise ValueError("plaintext not block-aligned — pad16 first")
    pk = _pack_keys(expand_key(key))
    out = bytearray()
    prev = [int.from_bytes(iv[i : i + 4], "big") for i in (0, 4, 8, 12)]
    for i in range(0, len(plaintext), 16):
        cols = [
            int.from_bytes(plaintext[i + j : i + j + 4], "big") ^ prev[n]
            for n, j in enumerate((0, 4, 8, 12))
        ]
        prev = _encrypt_cols(pk, cols)
        for x in prev:
            out += x.to_bytes(4, "big")
    return bytes(out)


def decrypt_cbc(
    key: bytes, iv: bytes, ciphertext: bytes, unpad: bool = True
) -> bytes | None:
    """Vectorized CBC decrypt of a whole stream; None on malformed
    input (bad length / bad padding) — callers quarantine, not raise."""
    if len(ciphertext) % 16 or not ciphertext:
        return None
    rks = expand_key(key)
    ct = np.frombuffer(ciphertext, dtype=np.uint8).reshape(-1, 16)
    s = ct ^ np.frombuffer(rks[-1], dtype=np.uint8)
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    for rk in rks[-2:0:-1]:
        s = _INV_SBOX[s[:, _INV_SHIFT]]
        s = s ^ np.frombuffer(rk, dtype=np.uint8)
        # InvMixColumns over each column (groups of 4 in flat layout)
        col = s.reshape(-1, 4, 4)
        a0, a1, a2, a3 = (col[:, :, r] for r in range(4))
        col = np.stack(
            [
                m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3],
                m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3],
                m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3],
                m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3],
            ],
            axis=2,
        )
        s = col.reshape(-1, 16)
    s = _INV_SBOX[s[:, _INV_SHIFT]] ^ np.frombuffer(rks[0], dtype=np.uint8)
    # CBC chain: pt_i = D(ct_i) ^ ct_{i-1}
    prev = np.vstack([np.frombuffer(iv, dtype=np.uint8), ct[:-1]])
    pt = (s ^ prev).tobytes()
    if not unpad:
        return pt
    n = pt[-1]
    if not 1 <= n <= 16 or pt[-n:] != bytes([n]) * n:
        return None
    return pt[:-n]
