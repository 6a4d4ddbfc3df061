"""AES-128 key schedule (host side, plaintext).

The reference's key_expansion.py is an empty file
(/root/reference/key_expansion.py, 0 bytes; SURVEY.md section 1 L5); round
keys are plaintext inputs to the encrypted pipeline, so the schedule runs on
the host.
"""
from __future__ import annotations

import numpy as np

from .coeffs.generate import AES_SBOX

RCON = np.array([0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36],
                dtype=np.uint8)


def expand_key_128(key: bytes | np.ndarray) -> np.ndarray:
    """16-byte key -> [11, 16] round keys (round 0 = the key itself).

    Round keys are returned flat in the same column-major byte order as the
    state layout (/root/reference/utils.py:11-27): byte i of a round key is
    word i//4, byte i%4.
    """
    key = np.frombuffer(bytes(key), dtype=np.uint8) if isinstance(key, (bytes, bytearray)) \
        else np.asarray(key, dtype=np.uint8)
    assert key.size == 16, "AES-128 key must be 16 bytes"
    words = [key[4 * i:4 * i + 4].copy() for i in range(4)]
    for i in range(4, 44):
        temp = words[i - 1].copy()
        if i % 4 == 0:
            temp = np.roll(temp, -1)               # RotWord
            temp = AES_SBOX[temp]                  # SubWord
            temp[0] ^= RCON[i // 4 - 1]
        words.append(words[i - 4] ^ temp)
    out = np.zeros((11, 16), dtype=np.uint8)
    for r in range(11):
        out[r] = np.concatenate(words[4 * r:4 * r + 4])
    return out
