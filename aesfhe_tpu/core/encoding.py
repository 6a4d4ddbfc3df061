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


def coeffs_to_digits(coeffs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Signed integer coefficients (f64 holding exact integer values) ->
    (digits[4, N] uint32 base 2^22, neg[N] bool); exact for |c| < 2^88.

    Companion of the on-device reduction (engine._digits_encode_core):
    residues r_i = +-(sum_k d_k * (2^(22k) mod q_i)) mod q_i complete on the
    VPU in microseconds, replacing this host's per-prime scalar uint64
    divisions (~300 ms per encode at prod_boot: 63 primes x 2^16 coeffs)
    that dominated the cold bootstrap's hi-diagonal cache fill.

    Every step is f64-exact regardless of magnitude: dividing by 2^22 and
    multiplying back are exponent shifts, and each remainder is < 2^22."""
    c = np.asarray(coeffs, dtype=np.float64)
    assert np.all(np.abs(c) < 2 ** 88), "coefficient overflow"
    neg = c < 0
    a = np.abs(c)
    digits = np.empty((4,) + c.shape[-1:], dtype=np.uint32)
    B = float(1 << 22)
    for k in range(4):
        nxt = np.floor(a / B)
        digits[k] = (a - nxt * B).astype(np.uint32)
        a = nxt
    return digits, neg


def coeffs_to_rns(coeffs: np.ndarray, primes: tuple[int, ...]) -> np.ndarray:
    """Signed integer coefficients (float64 holding exact integer values)
    -> uint64 residues [L, N].

    Above 2^62 the int64 cast would overflow, so large coefficients split
    exactly into hi*2^32 + lo (both f64-exact integers while |c| < 2^85)
    and reduce per prime in uint64 -- needed by the high-precision
    bootstrap's scale-lifting diagonal encodes (coefficients ~2^71 when a
    CTS group lifts Delta -> hi_scale with a_scale folded in)."""
    c = np.asarray(coeffs, dtype=np.float64)
    # broadcast the reduction across ALL primes at once ([L,1] x [1,N])
    # instead of a per-prime Python loop: the loop form cost ~70 ns/residue
    # in numpy dispatch overhead and dominated the cold bootstrap's
    # hi-diagonal cache fill (~180 encodes x ~300 ms at prod_boot)
    if np.all(np.abs(c) < 2 ** 62):
        ci = c.astype(np.int64)[None, :]
        qi = np.asarray(primes, dtype=np.int64).reshape(-1, 1)
        return np.mod(ci, qi).astype(np.uint64)
    assert np.all(np.abs(c) < 2 ** 85), "coefficient overflow"
    neg = (c < 0)[None, :]
    a = np.abs(c)
    hi = np.floor(a / 2 ** 32)            # exact: hi < 2^53
    lo = a - hi * 2 ** 32                 # exact: lo < 2^32
    hi_u = hi.astype(np.uint64)[None, :]
    lo_u = lo.astype(np.uint64)[None, :]
    qq = np.asarray(primes, dtype=np.uint64).reshape(-1, 1)
    base = np.asarray([(1 << 32) % int(q) for q in primes],
                      dtype=np.uint64).reshape(-1, 1)
    r = (hi_u % qq) * base % qq           # < 2^60, exact in uint64
    r = (r + lo_u % qq) % qq
    return np.where(neg, (qq - r) % qq, r)
