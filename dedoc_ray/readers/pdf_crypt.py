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
    rks = _expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for i in range(16, len(data) - 15, 16):
        block = data[i : i + 16]
        plain = _aes_decrypt_block(rks, block)
        out.extend(bytes(p ^ v for p, v in zip(plain, prev)))
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
