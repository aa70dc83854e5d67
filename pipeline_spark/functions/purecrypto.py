"""Pure-Python AES (FIPS-197) and RC4 primitives.

The engine's ``crypto`` module rides Spark's JVM ``aes_encrypt`` for bulk
column encryption; these primitives exist for protocol-level needs where
the ciphertext lives inside a *format* being parsed executor-side in
Python — most notably PDF standard-security decryption
(``functions/pdftext.py``), whose per-object keys and short stream
payloads make the pure-Python cost irrelevant.  Correctness is pinned to
the FIPS-197 / SP 800-38A known-answer vectors in
tests/test_purecrypto.py.

Scope: AES-128/192/256 block ops + CBC mode, RC4.  This is a *decoder
dependency*, not a security boundary — no constant-time claims.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# AES tables, computed at import from the GF(2^8) definitions in FIPS-197
# ---------------------------------------------------------------------------


def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverse via exponentiation tables on generator 3
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    for c in range(256):
        inv = 0 if c == 0 else exp[255 - log[c]]
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        sbox[c] = s ^ 0x63
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_MUL = {n: bytes(_gf_mul(n, c) for c in range(256)) for n in (2, 3, 9, 11, 13, 14)}
_RCON = [1]
while len(_RCON) < 14:
    _RCON.append(_gf_mul(_RCON[-1], 2))


class AES:
    """AES block cipher over 16-byte states (column-major, per FIPS-197)."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
        nk = len(key) // 4
        self.rounds = nk + 6
        words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
        for i in range(nk, 4 * (self.rounds + 1)):
            t = list(words[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[b] for b in t]
                t[0] ^= _RCON[i // nk - 1]
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            words.append([a ^ b for a, b in zip(words[i - nk], t)])
        # flat 16-byte round keys
        self._rk = [
            bytes(b for w in words[4 * r : 4 * r + 4] for b in w)
            for r in range(self.rounds + 1)
        ]

    # state is a bytearray of 16, laid out s[row + 4*col] — i.e. the same
    # byte order as the input block read column-by-column (FIPS-197 §3.4)

    def encrypt_block(self, block: bytes) -> bytes:
        s = bytearray(a ^ b for a, b in zip(block, self._rk[0]))
        for rnd in range(1, self.rounds + 1):
            # SubBytes
            for i in range(16):
                s[i] = _SBOX[s[i]]
            # ShiftRows: row r rotates left by r (rows are i % 4 here)
            s = bytearray(s[(i + 4 * (i % 4)) % 16] for i in range(16))
            if rnd < self.rounds:
                # MixColumns
                m2, m3 = _MUL[2], _MUL[3]
                out = bytearray(16)
                for c in range(0, 16, 4):
                    a0, a1, a2, a3 = s[c : c + 4]
                    out[c] = m2[a0] ^ m3[a1] ^ a2 ^ a3
                    out[c + 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
                    out[c + 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
                    out[c + 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
                s = out
            rk = self._rk[rnd]
            for i in range(16):
                s[i] ^= rk[i]
        return bytes(s)

    def decrypt_block(self, block: bytes) -> bytes:
        s = bytearray(a ^ b for a, b in zip(block, self._rk[self.rounds]))
        for rnd in range(self.rounds - 1, -1, -1):
            # InvShiftRows: row r rotates right by r
            s = bytearray(s[(i - 4 * (i % 4)) % 16] for i in range(16))
            for i in range(16):
                s[i] = _INV_SBOX[s[i]]
            rk = self._rk[rnd]
            for i in range(16):
                s[i] ^= rk[i]
            if rnd > 0:
                m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
                out = bytearray(16)
                for c in range(0, 16, 4):
                    a0, a1, a2, a3 = s[c : c + 4]
                    out[c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
                    out[c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
                    out[c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
                    out[c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
                s = out
        return bytes(s)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt; data length must be a multiple of 16.  Padding is NOT
    stripped here — PDF strips PKCS#7 at the call site (tolerantly)."""
    if len(data) % 16:
        raise ValueError("CBC ciphertext not block-aligned")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(aes.decrypt_block(blk), prev))
        prev = blk
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt; caller pads.  Needed by the PDF R6 password hash (2.B)
    and by test fixtures that build encrypted PDFs."""
    if len(data) % 16:
        raise ValueError("CBC plaintext not block-aligned")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = aes.encrypt_block(bytes(a ^ b for a, b in zip(data[i : i + 16], prev)))
        out += prev
    return bytes(out)


def aes_ecb_encrypt(key: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("ECB plaintext not block-aligned")
    aes = AES(key)
    return b"".join(
        aes.encrypt_block(data[i : i + 16]) for i in range(0, len(data), 16)
    )


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: same call encrypts and decrypts)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)
