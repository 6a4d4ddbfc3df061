"""Zeta-domain codec: integers <-> complex roots of unity.

Port of ZetaEncoder (/root/reference/xor_service.py:132-145) and the free
functions zeta_encode/zeta_decode (/root/reference/utils.py:40-59): integer k
maps to exp(-2j*pi*(k mod m)/m); decoding measures the phase and rounds.
"""
from __future__ import annotations

import numpy as np


class ZetaEncoder:
    @staticmethod
    def to_zeta(arr: np.ndarray, modulus: int = 16) -> np.ndarray:
        arr = np.asarray(arr).astype(np.int64, copy=False)
        return np.exp(-2j * np.pi * (arr % modulus) / modulus)

    @staticmethod
    def from_zeta(z_arr: np.ndarray, modulus: int = 16) -> np.ndarray:
        angles = np.angle(np.asarray(z_arr))
        k = (-angles * modulus) / (2 * np.pi)
        return np.mod(np.rint(k), modulus).astype(np.uint8)


def zeta_encode(arr, modulus: int = 16) -> np.ndarray:
    return ZetaEncoder.to_zeta(np.asarray(arr, dtype=np.int64), modulus)


def zeta_decode(z_arr: np.ndarray, modulus: int = 16) -> np.ndarray:
    return ZetaEncoder.from_zeta(z_arr, modulus)


def split_nibbles(flat: np.ndarray):
    """Byte array -> (hi, lo) nibbles (/root/reference/new.py:38-48,
    byte_split_nibble.py:3-20)."""
    flat = np.asarray(flat)
    if flat.dtype != np.uint8:
        flat = flat.astype(np.uint8, copy=False)
    upper = np.right_shift(flat, 4)
    lower = np.bitwise_and(flat, 0x0F)
    return upper, lower
