"""PDF standard security handler — empty-user-password decryption.

Most "encrypted" PDFs in a crawl are owner-locked but readable: the user
password is EMPTY and the viewer decrypts silently (the reference gets
this through pdfminer's PDFStandardSecurityHandler). This implements the
same published algorithms (PDF 1.7 spec §7.6.3, Algorithms 2/4/5 and the
V4 crypt filters):

- RC4 (V1/V2 and the R4 /U handshake) — 20 lines of stdlib;
- AES-128-CBC (/CFM /AESV2) — implemented from first principles: the
  S-box is GENERATED (multiplicative inverse in GF(2^8) + affine
  transform), so there is no table to mistype, and the file's own /U
  entry verifies the whole pipeline during authentication;
- key derivation: MD5 over pad + /O + /P + ID[0] (+ FFFFFFFF when
  /EncryptMetadata false), 50 MD5 iterations for R≥3; per-object keys
  via MD5(key + num + gen [+ sAlT for AES]).

Only the empty-user-password subset is supported — a real password
prompt has no place in a streaming corpus pipeline; those files keep the
explicit PdfEncrypted error.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Optional

# PDF 1.7 §7.6.3.3 — the standard 32-byte padding string
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
        0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ------------------------------------------------------------- AES-128


def _gf_mul(a: int, b: int) -> int:
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


def _build_sbox():
    # multiplicative inverse in GF(2^8) + the affine transform — generated,
    # not transcribed, so the table cannot be silently wrong
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = [0] * 256
    for x in range(256):
        b = inv[x]
        r = 0
        for i in range(8):
            bit = ((b >> i) & 1) ^ ((b >> ((i + 4) % 8)) & 1) ^ ((b >> ((i + 5) % 8)) & 1) \
                  ^ ((b >> ((i + 6) % 8)) & 1) ^ ((b >> ((i + 7) % 8)) & 1) ^ ((0x63 >> i) & 1)
            r |= bit << i
        sbox[x] = r
    inv_sbox = [0] * 256
    for x, v in enumerate(sbox):
        inv_sbox[v] = x
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes):
    words = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(words[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        words.append([a ^ b for a, b in zip(words[i - 4], t)])
    return [words[4 * r : 4 * r + 4] for r in range(11)]


def _add_round_key(state, rk):
    for c in range(4):
        for r in range(4):
            state[r][c] ^= rk[c][r]


def _inv_shift_rows(state):
    for r in range(1, 4):
        state[r] = state[r][-r:] + state[r][:-r]


def _inv_sub_bytes(state):
    for r in range(4):
        state[r] = [_INV_SBOX[b] for b in state[r]]


def _inv_mix_columns(state):
    for c in range(4):
        a = [state[r][c] for r in range(4)]
        state[0][c] = _gf_mul(a[0], 14) ^ _gf_mul(a[1], 11) ^ _gf_mul(a[2], 13) ^ _gf_mul(a[3], 9)
        state[1][c] = _gf_mul(a[0], 9) ^ _gf_mul(a[1], 14) ^ _gf_mul(a[2], 11) ^ _gf_mul(a[3], 13)
        state[2][c] = _gf_mul(a[0], 13) ^ _gf_mul(a[1], 9) ^ _gf_mul(a[2], 14) ^ _gf_mul(a[3], 11)
        state[3][c] = _gf_mul(a[0], 11) ^ _gf_mul(a[1], 13) ^ _gf_mul(a[2], 9) ^ _gf_mul(a[3], 14)


def _aes_decrypt_block(rks, block: bytes) -> bytes:
    state = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
    _add_round_key(state, rks[10])
    for rnd in range(9, 0, -1):
        _inv_shift_rows(state)
        _inv_sub_bytes(state)
        _add_round_key(state, rks[rnd])
        _inv_mix_columns(state)
    _inv_shift_rows(state)
    _inv_sub_bytes(state)
    _add_round_key(state, rks[0])
    return bytes(state[r][c] for c in range(4) for r in range(4))


def aes128_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """data = IV ‖ ciphertext (the PDF AESV2 layout); PKCS#5 unpadded."""
    if len(data) < 32:
        return b""
    dkw, nr = _dec_schedule(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data) - 15, 16):
        block = data[i : i + 16]
        plain = _decrypt_block_words(dkw, nr, block)
        out.extend((int.from_bytes(plain, "big") ^ int.from_bytes(prev, "big")).to_bytes(16, "big"))
        prev = block
    pad = out[-1] if out else 0
    if 1 <= pad <= 16 and len(out) >= pad:
        del out[-pad:]
    return bytes(out)


# ------------------------------------------------ standard handler (R2-R4)


class StandardSecurityHandler:
    """Empty-user-password authentication + per-object decryption."""

    def __init__(self, enc: dict, id0: bytes, resolve) -> None:
        self.r = int(resolve(enc.get("R", 2)))
        self.v = int(resolve(enc.get("V", 1)))
        length = int(resolve(enc.get("Length", 40)))
        self.key_len = max(5, min(16, length // 8))
        self.o = bytes(resolve(enc.get("O", b"")))[:32]
        self.u = bytes(resolve(enc.get("U", b"")))[:32]
        self.p = int(resolve(enc.get("P", -1))) & 0xFFFFFFFF
        self.encrypt_metadata = bool(resolve(enc.get("EncryptMetadata", True)))
        self.id0 = id0
        self.aes = False
        if self.v == 4:
            cf = resolve(enc.get("CF")) or {}
            stdcf = resolve(cf.get("StdCF")) if isinstance(cf, dict) else None
            cfm = str(resolve(stdcf.get("CFM", ""))) if isinstance(stdcf, dict) else ""
            self.aes = cfm == "AESV2"
            if isinstance(stdcf, dict) and "Length" in stdcf:
                ln = int(resolve(stdcf["Length"]))
                self.key_len = max(5, min(16, ln if ln <= 16 else ln // 8))
        self.key: Optional[bytes] = None

    def authenticate_empty_password(self) -> bool:
        """Algorithm 2 with the empty user password, verified per Alg 4/5."""
        h = hashlib.md5()
        h.update(_PAD)
        h.update(self.o)
        h.update(struct.pack("<I", self.p))
        h.update(self.id0)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[: self.key_len]).digest()
        key = key[: self.key_len]
        # verify against /U
        if self.r == 2:
            u = rc4(key, _PAD)
            ok = u == self.u
        else:
            digest = hashlib.md5(_PAD + self.id0).digest()
            u = rc4(key, digest)
            for i in range(1, 20):
                u = rc4(bytes(b ^ i for b in key), u)
            ok = u[:16] == self.u[:16]
        if ok:
            self.key = key
        return ok

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        if self.key is None or not data:
            return data
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<I", num)[:3])
        h.update(struct.pack("<I", gen)[:2])
        if self.aes:
            h.update(b"sAlT")
        obj_key = h.digest()[: min(self.key_len + 5, 16)]
        if self.aes:
            return aes128_cbc_decrypt(obj_key, data)
        return rc4(obj_key, data)


# ----------------------------------------------- AES forward + 256-bit


def _expand_key_n(key: bytes):
    """AES key schedule for 128/192/256-bit keys → list of round keys."""
    nk = len(key) // 4
    nr = {4: 10, 6: 12, 8: 14}[nk]
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [words[4 * r : 4 * r + 4] for r in range(nr + 1)], nr


def _shift_rows(state):
    for r in range(1, 4):
        state[r] = state[r][r:] + state[r][:r]


def _sub_bytes(state):
    for r in range(4):
        state[r] = [_SBOX[b] for b in state[r]]


def _mix_columns(state):
    for c in range(4):
        a = [state[r][c] for r in range(4)]
        state[0][c] = _gf_mul(a[0], 2) ^ _gf_mul(a[1], 3) ^ a[2] ^ a[3]
        state[1][c] = a[0] ^ _gf_mul(a[1], 2) ^ _gf_mul(a[2], 3) ^ a[3]
        state[2][c] = a[0] ^ a[1] ^ _gf_mul(a[2], 2) ^ _gf_mul(a[3], 3)
        state[3][c] = _gf_mul(a[0], 3) ^ a[1] ^ a[2] ^ _gf_mul(a[3], 2)


# T-tables for the forward cipher (derived from the generated S-box):
# each round collapses SubBytes+ShiftRows+MixColumns into 4 lookups/column.
# The hardened R6 KDF runs ~8000 block encrypts per derivation — the naive
# matrix form costs seconds per call, the T-table form ~0.2 s.
_T0 = [0] * 256
_T1 = [0] * 256
_T2 = [0] * 256
_T3 = [0] * 256
for _x in range(256):
    _s = _SBOX[_x]
    _s2 = _gf_mul(_s, 2)
    _s3 = _s2 ^ _s
    _T0[_x] = (_s2 << 24) | (_s << 16) | (_s << 8) | _s3
    _T1[_x] = (_s3 << 24) | (_s2 << 16) | (_s << 8) | _s
    _T2[_x] = (_s << 24) | (_s3 << 16) | (_s2 << 8) | _s
    _T3[_x] = (_s << 24) | (_s << 16) | (_s3 << 8) | _s2


def _rk_words(rks):
    """Round keys (list of 4-word lists of 4-byte lists) → flat 32-bit words."""
    return [
        [(w[0] << 24) | (w[1] << 16) | (w[2] << 8) | w[3] for w in rk]
        for rk in rks
    ]


def _encrypt_block_words(rkw, nr, block: bytes) -> bytes:
    t0, t1, t2, t3, sbox = _T0, _T1, _T2, _T3, _SBOX
    s0 = int.from_bytes(block[0:4], "big") ^ rkw[0][0]
    s1 = int.from_bytes(block[4:8], "big") ^ rkw[0][1]
    s2 = int.from_bytes(block[8:12], "big") ^ rkw[0][2]
    s3 = int.from_bytes(block[12:16], "big") ^ rkw[0][3]
    for rnd in range(1, nr):
        rk = rkw[rnd]
        u0 = (t0[s0 >> 24] ^ t1[(s1 >> 16) & 0xFF] ^ t2[(s2 >> 8) & 0xFF] ^ t3[s3 & 0xFF]) ^ rk[0]
        u1 = (t0[s1 >> 24] ^ t1[(s2 >> 16) & 0xFF] ^ t2[(s3 >> 8) & 0xFF] ^ t3[s0 & 0xFF]) ^ rk[1]
        u2 = (t0[s2 >> 24] ^ t1[(s3 >> 16) & 0xFF] ^ t2[(s0 >> 8) & 0xFF] ^ t3[s1 & 0xFF]) ^ rk[2]
        u3 = (t0[s3 >> 24] ^ t1[(s0 >> 16) & 0xFF] ^ t2[(s1 >> 8) & 0xFF] ^ t3[s2 & 0xFF]) ^ rk[3]
        s0, s1, s2, s3 = u0, u1, u2, u3
    rk = rkw[nr]
    o0 = ((sbox[s0 >> 24] << 24) | (sbox[(s1 >> 16) & 0xFF] << 16) | (sbox[(s2 >> 8) & 0xFF] << 8) | sbox[s3 & 0xFF]) ^ rk[0]
    o1 = ((sbox[s1 >> 24] << 24) | (sbox[(s2 >> 16) & 0xFF] << 16) | (sbox[(s3 >> 8) & 0xFF] << 8) | sbox[s0 & 0xFF]) ^ rk[1]
    o2 = ((sbox[s2 >> 24] << 24) | (sbox[(s3 >> 16) & 0xFF] << 16) | (sbox[(s0 >> 8) & 0xFF] << 8) | sbox[s1 & 0xFF]) ^ rk[2]
    o3 = ((sbox[s3 >> 24] << 24) | (sbox[(s0 >> 16) & 0xFF] << 16) | (sbox[(s1 >> 8) & 0xFF] << 8) | sbox[s2 & 0xFF]) ^ rk[3]
    return o0.to_bytes(4, "big") + o1.to_bytes(4, "big") + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")


# inverse T-tables (equivalent inverse cipher, FIPS-197 §5.3.5): round keys
# 1..Nr-1 pass through InvMixColumns, rounds collapse to 4 lookups/column
_D0 = [0] * 256
_D1 = [0] * 256
_D2 = [0] * 256
_D3 = [0] * 256
for _x in range(256):
    _is = _INV_SBOX[_x]
    _m9, _m11, _m13, _m14 = _gf_mul(_is, 9), _gf_mul(_is, 11), _gf_mul(_is, 13), _gf_mul(_is, 14)
    _D0[_x] = (_m14 << 24) | (_m9 << 16) | (_m13 << 8) | _m11
    _D1[_x] = (_m11 << 24) | (_m14 << 16) | (_m9 << 8) | _m13
    _D2[_x] = (_m13 << 24) | (_m11 << 16) | (_m14 << 8) | _m9
    _D3[_x] = (_m9 << 24) | (_m13 << 16) | (_m11 << 8) | _m14


def _inv_mix_word(w: int) -> int:
    b = [(w >> 24) & 0xFF, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF]
    return (
        ((_gf_mul(b[0], 14) ^ _gf_mul(b[1], 11) ^ _gf_mul(b[2], 13) ^ _gf_mul(b[3], 9)) << 24)
        | ((_gf_mul(b[0], 9) ^ _gf_mul(b[1], 14) ^ _gf_mul(b[2], 11) ^ _gf_mul(b[3], 13)) << 16)
        | ((_gf_mul(b[0], 13) ^ _gf_mul(b[1], 9) ^ _gf_mul(b[2], 14) ^ _gf_mul(b[3], 11)) << 8)
        | (_gf_mul(b[0], 11) ^ _gf_mul(b[1], 13) ^ _gf_mul(b[2], 9) ^ _gf_mul(b[3], 14))
    )


def _dec_schedule(key: bytes):
    rks, nr = _expand_key_n(key)
    rkw = _rk_words(rks)
    dkw = [list(rkw[0])] + [[_inv_mix_word(w) for w in rkw[r]] for r in range(1, nr)] + [list(rkw[nr])]
    return dkw, nr


def _decrypt_block_words(dkw, nr, block: bytes) -> bytes:
    d0, d1, d2, d3, isb = _D0, _D1, _D2, _D3, _INV_SBOX
    s0 = int.from_bytes(block[0:4], "big") ^ dkw[nr][0]
    s1 = int.from_bytes(block[4:8], "big") ^ dkw[nr][1]
    s2 = int.from_bytes(block[8:12], "big") ^ dkw[nr][2]
    s3 = int.from_bytes(block[12:16], "big") ^ dkw[nr][3]
    for rnd in range(nr - 1, 0, -1):
        rk = dkw[rnd]
        u0 = (d0[s0 >> 24] ^ d1[(s3 >> 16) & 0xFF] ^ d2[(s2 >> 8) & 0xFF] ^ d3[s1 & 0xFF]) ^ rk[0]
        u1 = (d0[s1 >> 24] ^ d1[(s0 >> 16) & 0xFF] ^ d2[(s3 >> 8) & 0xFF] ^ d3[s2 & 0xFF]) ^ rk[1]
        u2 = (d0[s2 >> 24] ^ d1[(s1 >> 16) & 0xFF] ^ d2[(s0 >> 8) & 0xFF] ^ d3[s3 & 0xFF]) ^ rk[2]
        u3 = (d0[s3 >> 24] ^ d1[(s2 >> 16) & 0xFF] ^ d2[(s1 >> 8) & 0xFF] ^ d3[s0 & 0xFF]) ^ rk[3]
        s0, s1, s2, s3 = u0, u1, u2, u3
    rk = dkw[0]
    o0 = ((isb[s0 >> 24] << 24) | (isb[(s3 >> 16) & 0xFF] << 16) | (isb[(s2 >> 8) & 0xFF] << 8) | isb[s1 & 0xFF]) ^ rk[0]
    o1 = ((isb[s1 >> 24] << 24) | (isb[(s0 >> 16) & 0xFF] << 16) | (isb[(s3 >> 8) & 0xFF] << 8) | isb[s2 & 0xFF]) ^ rk[1]
    o2 = ((isb[s2 >> 24] << 24) | (isb[(s1 >> 16) & 0xFF] << 16) | (isb[(s0 >> 8) & 0xFF] << 8) | isb[s3 & 0xFF]) ^ rk[2]
    o3 = ((isb[s3 >> 24] << 24) | (isb[(s2 >> 16) & 0xFF] << 16) | (isb[(s1 >> 8) & 0xFF] << 8) | isb[s0 & 0xFF]) ^ rk[3]
    return o0.to_bytes(4, "big") + o1.to_bytes(4, "big") + o2.to_bytes(4, "big") + o3.to_bytes(4, "big")


def _encrypt_block_rks(rks, nr, block: bytes) -> bytes:
    state = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
    _add_round_key(state, rks[0])
    for rnd in range(1, nr):
        _sub_bytes(state)
        _shift_rows(state)
        _mix_columns(state)
        _add_round_key(state, rks[rnd])
    _sub_bytes(state)
    _shift_rows(state)
    _add_round_key(state, rks[nr])
    return bytes(state[r][c] for c in range(4) for r in range(4))


def aes_encrypt_block(key: bytes, block: bytes) -> bytes:
    rks, nr = _expand_key_n(key)
    return _encrypt_block_rks(rks, nr, block)


def _decrypt_block_rks(rks, nr, block: bytes) -> bytes:
    state = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
    _add_round_key(state, rks[nr])
    for rnd in range(nr - 1, 0, -1):
        _inv_shift_rows(state)
        _inv_sub_bytes(state)
        _add_round_key(state, rks[rnd])
        _inv_mix_columns(state)
    _inv_shift_rows(state)
    _inv_sub_bytes(state)
    _add_round_key(state, rks[0])
    return bytes(state[r][c] for c in range(4) for r in range(4))


def aes_decrypt_block_any(key: bytes, block: bytes) -> bytes:
    rks, nr = _expand_key_n(key)
    return _decrypt_block_rks(rks, nr, block)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """No-padding CBC encrypt (data length must be a block multiple);
    key schedule expanded ONCE per message, T-table block cipher."""
    rks, nr = _expand_key_n(key)
    rkw = _rk_words(rks)
    out = bytearray()
    prev = iv
    xor16 = int.from_bytes
    for i in range(0, len(data), 16):
        block = (xor16(data[i : i + 16], "big") ^ xor16(prev, "big")).to_bytes(16, "big")
        prev = _encrypt_block_words(rkw, nr, block)
        out.extend(prev)
    return bytes(out)


def aes_cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    dkw, nr = _dec_schedule(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data) - 15, 16):
        block = data[i : i + 16]
        plain = _decrypt_block_words(dkw, nr, block)
        out.extend((int.from_bytes(plain, "big") ^ int.from_bytes(prev, "big")).to_bytes(16, "big"))
        prev = block
    return bytes(out)


# ------------------------------------------ R6 (AES-256) key derivation


import functools


@functools.lru_cache(maxsize=64)
def hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the hardened SHA-2 KDF. Deliberately
    expensive by design (~64 AES-CBC rounds over 2 KiB); cached because a
    corpus of empty-password files reuses the same salts."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class R6SecurityHandler:
    """AES-256 (V5/R6, /CFM AESV3) standard handler — empty user password."""

    def __init__(self, enc: dict, resolve) -> None:
        self.u = bytes(resolve(enc.get("U", b"")))
        self.ue = bytes(resolve(enc.get("UE", b"")))
        self.aes = True
        self.key: Optional[bytes] = None

    def authenticate_empty_password(self) -> bool:
        if len(self.u) < 48 or len(self.ue) < 32:
            return False
        vsalt = self.u[32:40]
        ksalt = self.u[40:48]
        if hash_r6(b"", vsalt) != self.u[:32]:
            return False
        ikey = hash_r6(b"", ksalt)
        self.key = aes_cbc_decrypt_nopad(ikey, b"\x00" * 16, self.ue[:32])
        return True

    def decrypt(self, data: bytes, num: int, gen: int) -> bytes:
        # V5: ONE file key for every object; data = IV || ciphertext
        if self.key is None or len(data) < 16:
            return data
        plain = aes_cbc_decrypt_nopad(self.key, data[:16], data[16:])
        pad = plain[-1] if plain else 0
        if 1 <= pad <= 16 and len(plain) >= pad:
            plain = plain[:-pad]
        return plain
