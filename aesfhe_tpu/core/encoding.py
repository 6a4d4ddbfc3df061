"""CKKS canonical-embedding encode/decode (host side, numpy).

Slots z in C^(N/2) <-> integer polynomial coefficients, via the 2N-th root
psi_C = exp(i*pi/N).  Slot j is the evaluation at psi_C^(5^j mod 2N); the
conjugate evaluation points carry conj(z), making coefficients real.

The reference delegates this to desilofhe's encode/decode
(/root/reference/xor_service.py:59-66); here it is explicit so that the NTT
evaluation order, rotation group and conjugation all share one convention
(params.sigma / params.slot_pos).
"""
from __future__ import annotations

import numpy as np

from .params import CKKSParams


def slots_to_coeffs(z: np.ndarray, params: CKKSParams, scale: float) -> np.ndarray:
    """Complex slot vector [<=N/2] -> rounded integer coefficients [N] (int64-ish
    object/float array).  Returns float64 (exact for |coeff| < 2^53)."""
    n = params.n
    sc = params.slot_count
    z = np.asarray(z, dtype=np.complex128)
    if z.size < sc:
        z = np.pad(z, (0, sc - z.size))
    elif z.size > sc:
        raise ValueError(f"too many slots: {z.size} > {sc}")
    # natural-order eval vector val'[j] = value at exponent 2j+1
    val = np.zeros(n, dtype=np.complex128)
    val[params.slot_pos] = z
    val[params.conj_slot_pos] = np.conj(z)
    # val is indexed by *output slot position*; convert to natural exponent
    # order: natural[j] = val at exponent 2j+1 = val[pos_of_exp[2j+1]]
    natural = val[params.pos_of_exp[1::2]]
    # p_k = (1/N) * psi_C^-k * FFT(natural)_k   (FFT = sum_j x_j e^{-2pi i jk/N})
    p = np.fft.fft(natural) * params.psi_c_pow_inv / n
    coeffs = np.round(p.real * scale)
    return coeffs


def coeffs_to_slots(coeffs: np.ndarray, params: CKKSParams, scale: float) -> np.ndarray:
    """Float coefficient vector [N] -> complex slots [N/2]."""
    n = params.n
    p = np.asarray(coeffs, dtype=np.float64) / scale
    natural = np.fft.ifft(p * params.psi_c_pow) * n
    val = np.zeros(n, dtype=np.complex128)
    val[params.pos_of_exp[1::2]] = natural
    return val[params.slot_pos]


def coeffs_to_rns(coeffs: np.ndarray, primes: tuple[int, ...]) -> np.ndarray:
    """Signed integer coefficients (float64, exact) -> uint64 residues [L, N]."""
    c = np.asarray(coeffs, dtype=np.float64)
    assert np.all(np.abs(c) < 2 ** 62), "coefficient overflow"
    ci = c.astype(np.int64)
    out = np.zeros((len(primes), c.shape[-1]), dtype=np.uint64)
    for i, q in enumerate(primes):
        out[i] = np.mod(ci, np.int64(q)).astype(np.uint64)  # numpy mod >= 0
    return out
