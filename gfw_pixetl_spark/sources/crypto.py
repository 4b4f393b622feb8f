"""Pure-Python RC4 and AES-128/192/256 (FIPS-197) + CBC mode — the two
ciphers the PDF standard security handler (ISO 32000-1 7.6) uses for
/V 1-2 (RC4) and /V 4 /AESV2 (AES-128-CBC). Implemented from the public
specs; the AES S-box and round constants are GENERATED from the GF(2^8)
algebra rather than transcribed, and tests pin the FIPS-197 appendix
vectors. This is a decode-path dependency (corpus PDFs encrypted with
an empty user password — the overwhelmingly common case), not a
security library.
"""

from __future__ import annotations


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------------
# AES tables, generated from GF(2^8) with the AES polynomial 0x11B
# --------------------------------------------------------------------------


def _gmul(a: int, b: int) -> int:
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


def _gen_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverses via log/antilog tables on generator 3
    exp, log = [0] * 256, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gmul(x, 3)
    sbox = [0] * 256
    for v in range(256):
        inv = 0 if v == 0 else exp[(255 - log[v]) % 255]
        # affine transform: b ^ rot1 ^ rot2 ^ rot3 ^ rot4 ^ 0x63
        b = inv
        r = b
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            r ^= b
        sbox[v] = r ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _gen_sbox()
_RCON = [1]
while len(_RCON) < 14:
    _RCON.append(_gmul(_RCON[-1], 2))


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 128/192/256 bits")
    nr = nk + 6
    words = [list(key[4 * i:4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    # round keys as 16-byte lists
    return [sum(words[4 * r:4 * r + 4], []) for r in range(nr + 1)]


def _mix_single(col: list[int], inv: bool) -> list[int]:
    a, b, c, d = col
    if not inv:
        return [
            _gmul(a, 2) ^ _gmul(b, 3) ^ c ^ d,
            a ^ _gmul(b, 2) ^ _gmul(c, 3) ^ d,
            a ^ b ^ _gmul(c, 2) ^ _gmul(d, 3),
            _gmul(a, 3) ^ b ^ c ^ _gmul(d, 2),
        ]
    return [
        _gmul(a, 14) ^ _gmul(b, 11) ^ _gmul(c, 13) ^ _gmul(d, 9),
        _gmul(a, 9) ^ _gmul(b, 14) ^ _gmul(c, 11) ^ _gmul(d, 13),
        _gmul(a, 13) ^ _gmul(b, 9) ^ _gmul(c, 14) ^ _gmul(d, 11),
        _gmul(a, 11) ^ _gmul(b, 13) ^ _gmul(c, 9) ^ _gmul(d, 14),
    ]


def _encrypt_block(block: bytes, rk: list[list[int]]) -> bytes:
    s = [b ^ k for b, k in zip(block, rk[0])]
    nr = len(rk) - 1
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major state: byte i of column c comes
        # from column (c + i) mod 4
        s = [s[(4 * ((c + i) % 4)) + i] for c in range(4)
             for i in range(4)]
        if rnd != nr:
            out = []
            for c in range(4):
                out += _mix_single(s[4 * c:4 * c + 4], False)
            s = out
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    return bytes(s)


def _decrypt_block(block: bytes, rk: list[list[int]]) -> bytes:
    nr = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[nr])]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows: byte i of column c comes from column (c - i)
        s = [s[(4 * ((c - i) % 4)) + i] for c in range(4)
             for i in range(4)]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        if rnd != 0:
            out = []
            for c in range(4):
                out += _mix_single(s[4 * c:4 * c + 4], True)
            s = out
    return bytes(s)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC with PKCS#7 padding (what PDF AESV2 streams use); the IV
    is NOT prepended — PDF prepends it to the ciphertext itself."""
    rk = _expand_key(key)
    pad = 16 - len(data) % 16
    data = data + bytes([pad]) * pad
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(x ^ y for x, y in zip(data[i:i + 16], prev))
        prev = _encrypt_block(block, rk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("AES-CBC ciphertext length not a multiple of 16")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i:i + 16]
        out += bytes(x ^ y for x, y in zip(_decrypt_block(block, rk),
                                           prev))
        prev = block
    pad = out[-1] if out else 0
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("AES-CBC: bad PKCS#7 padding")
    return bytes(out[:-pad])
