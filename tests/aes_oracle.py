"""Plain numpy AES-128 oracle (the reference embeds equivalents in each test
file, e.g. /root/reference/test/test_shift_mix_fhe.py:12-72)."""
import numpy as np

from aesfhe_tpu.coeffs.generate import AES_SBOX, gf_table
from aesfhe_tpu.keyexp import expand_key_128

GF2 = gf_table(2)
GF3 = gf_table(3)


def shift_rows(state16: np.ndarray) -> np.ndarray:
    s = state16.reshape(4, 4, order="F").copy()
    for r in range(1, 4):
        s[r] = np.roll(s[r], -r)
    return s.reshape(16, order="F")


def inv_shift_rows(state16: np.ndarray) -> np.ndarray:
    s = state16.reshape(4, 4, order="F").copy()
    for r in range(1, 4):
        s[r] = np.roll(s[r], r)
    return s.reshape(16, order="F")


def mix_columns(state16: np.ndarray) -> np.ndarray:
    s = state16.reshape(4, 4, order="F")
    out = np.zeros_like(s)
    for c in range(4):
        a = s[:, c]
        out[0, c] = GF2[a[0]] ^ GF3[a[1]] ^ a[2] ^ a[3]
        out[1, c] = a[0] ^ GF2[a[1]] ^ GF3[a[2]] ^ a[3]
        out[2, c] = a[0] ^ a[1] ^ GF2[a[2]] ^ GF3[a[3]]
        out[3, c] = GF3[a[0]] ^ a[1] ^ a[2] ^ GF2[a[3]]
    return out.reshape(16, order="F")


def inv_mix_columns(state16: np.ndarray) -> np.ndarray:
    tables = {m: gf_table(m) for m in (9, 11, 13, 14)}
    M = [[14, 11, 13, 9], [9, 14, 11, 13], [13, 9, 14, 11], [11, 13, 9, 14]]
    s = state16.reshape(4, 4, order="F")
    out = np.zeros_like(s)
    for c in range(4):
        for r in range(4):
            v = 0
            for j in range(4):
                v ^= tables[M[r][j]][s[j, c]] if M[r][j] != 1 else s[j, c]
            out[r, c] = v
    return out.reshape(16, order="F")


def aes128_encrypt_block(pt16: np.ndarray, key16) -> np.ndarray:
    rks = expand_key_128(key16)
    s = np.asarray(pt16, dtype=np.uint8) ^ rks[0]
    for r in range(1, 10):
        s = AES_SBOX[s]
        s = shift_rows(s)
        s = mix_columns(s)
        s = s ^ rks[r]
    s = AES_SBOX[s]
    s = shift_rows(s)
    return s ^ rks[10]


def aes128_partial(pt16: np.ndarray, key16, rounds: int) -> np.ndarray:
    """ARK0 then `rounds` middle rounds (round 10 = final round w/o Mix)."""
    rks = expand_key_128(key16)
    s = np.asarray(pt16, dtype=np.uint8) ^ rks[0]
    for r in range(1, rounds + 1):
        s = AES_SBOX[s]
        s = shift_rows(s)
        if r != 10:
            s = mix_columns(s)
        s = s ^ rks[r]
    return s
