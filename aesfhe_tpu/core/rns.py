"""RNS (residue number system) modular arithmetic for TPU.

TPU has no native 64-bit integer multiply, so all mod-q arithmetic is built
from exact uint32 operations: uint32 multiply wraps mod 2^32 (exact low word),
and the high word is assembled from 16-bit partial products.  Every polynomial
limb lives on device as uint32 in Montgomery form (x*2^32 mod q) so that
ciphertext x ciphertext multiplies are a single REDC; multiplications by
*constants* (NTT twiddles, plaintext scalars) use Shoup's trick which takes a
plain-domain constant and preserves the Montgomery form of the variable input.

Replaces the native modular arithmetic inside the reference's closed-source
`desilofhe` engine (see SURVEY.md section 2.1; /root/reference/engine_context.py:6).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# Host-side prime/table generation (numpy / python ints)
# ---------------------------------------------------------------------------

def _is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def find_ntt_primes(bits: int, two_n: int, count: int,
                    skip: tuple[int, ...] = ()) -> list[int]:
    """Find `count` primes q = k*two_n + 1 closest to 2**bits (alternating
    above/below so rescale scale-drift partially cancels), q <= 2^30 so all
    device arithmetic closes over uint32 (see barrett_reduce)."""
    base = 1 << bits
    step = two_n
    found: list[int] = []
    k = 0
    # search outward from 2**bits
    while len(found) < count:
        k += 1
        for cand in (base + k * step + 1, base - k * step + 1):
            if cand > (1 << 30) or cand <= two_n:
                continue
            if cand in skip or cand in found:
                continue
            if _is_prime(cand):
                found.append(cand)
                if len(found) == count:
                    break
    return found


def _find_primitive_2n_root(q: int, two_n: int) -> int:
    """Find psi, a primitive (two_n)-th root of unity mod q."""
    assert (q - 1) % two_n == 0
    cof = (q - 1) // two_n
    g = 2
    while True:
        psi = pow(g, cof, q)
        # psi has order dividing two_n; need order exactly two_n
        if pow(psi, two_n // 2, q) == q - 1:
            return psi
        g += 1


def montgomery_consts(q: int) -> tuple[int, int]:
    """Return (qinv_neg, r2): -q^-1 mod 2^32 and 2^64 mod q."""
    qinv = pow(q, -1, 1 << 32)
    qinv_neg = ((1 << 32) - qinv) % (1 << 32)
    r2 = (1 << 64) % q
    return qinv_neg, r2


def shoup_precompute(w: int, q: int) -> int:
    """floor(w * 2^32 / q) for Shoup modular multiplication by constant w < q."""
    assert 0 <= w < q
    return (w << 32) // q


# ---------------------------------------------------------------------------
# Device-side exact uint32 arithmetic (jnp; works identically on TPU and CPU)
# ---------------------------------------------------------------------------

def mulhi32(a, b):
    """Exact high 32 bits of a*b for uint32 a, b (built from 16-bit halves)."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    lo = a0 * b0                       # exact: < 2^32
    m1 = a1 * b0                       # exact
    m2 = a0 * b1                       # exact
    t = (lo >> 16) + (m1 & MASK16) + (m2 & MASK16)   # < 3*2^16
    return a1 * b1 + (m1 >> 16) + (m2 >> 16) + (t >> 16)


def add_mod(a, b, q):
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)


def mont_mul(a, b, q, qinv_neg):
    """Montgomery product REDC(a*b) = a*b*2^-32 mod q, for q < 2^31 odd.

    If a, b are in Montgomery form the result is the Montgomery form of the
    plain product.  All intermediate uint32 ops are exact-with-wraparound.
    """
    t_lo = a * b
    t_hi = mulhi32(a, b)
    m = t_lo * qinv_neg
    mq_hi = mulhi32(m, q)
    carry = (t_lo != 0).astype(U32)
    u = t_hi + mq_hi + carry           # < 2q < 2^32
    return jnp.where(u >= q, u - q, u)


def shoup_mul(x, w, w_shoup, q):
    """x * w mod q with precomputed w_shoup = floor(w*2^32/q); w < q, any x.

    If x is in Montgomery form and w is a plain-domain constant, the result is
    the Montgomery form of (plain x) * w.  Used for NTT twiddles and scalar
    plaintext constants.
    """
    hi = mulhi32(x, w_shoup)
    r = x * w - hi * q                 # wraps; true value in [0, 2q)
    return jnp.where(r >= q, r - q, r)


def to_mont(a, q, qinv_neg, r2):
    """Plain -> Montgomery: REDC(a * (2^64 mod q))."""
    return mont_mul(a, r2, q, qinv_neg)


def from_mont(a, q, qinv_neg):
    """Montgomery -> plain: REDC(a * 1)."""
    return mont_mul(a, jnp.uint32(1), q, qinv_neg)


def barrett_magic(q: int) -> int:
    """Precompute floor(2^32 / q) for barrett_reduce."""
    return (1 << 32) // q


def barrett_reduce(x, q, magic):
    """Reduce arbitrary uint32 x mod q, q <= 2^30, magic = floor(2^32/q).

    Approximate quotient t = mulhi(x, magic) is off by at most 2, so the
    remainder candidate is < 3q < 2^32 (no wrap ambiguity for q <= 2^30).
    """
    t = mulhi32(x, magic)
    r = x - t * q
    r = jnp.where(r >= q, r - q, r)
    r = jnp.where(r >= q, r - q, r)
    return r


# ---------------------------------------------------------------------------
# Host-side exact CRT reconstruction (Garner) for decrypt/decode
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _garner_tables(primes: tuple[int, ...]):
    """Precompute inv(prod_{j<i} q_j) mod q_i for Garner mixed-radix digits."""
    L = len(primes)
    inv = np.zeros((L,), dtype=np.uint64)
    for i in range(1, L):
        p = 1
        for j in range(i):
            p = (p * primes[j]) % primes[i]
        inv[i] = pow(p, -1, primes[i])
    return inv


def _garner_digits(residues: np.ndarray, primes: tuple[int, ...]) -> np.ndarray:
    """Mixed-radix digits d_i of the CRT value: v = sum_i d_i * prod_{j<i} q_j.

    residues: uint64 array [L, ...] with residues[i] < q_i; returns uint64
    digits [L, ...] with digits[i] < q_i.  All intermediate products fit in
    uint64 since primes < 2^31.
    """
    primes_np = np.asarray(primes, dtype=np.uint64).reshape(
        (len(primes),) + (1,) * (residues.ndim - 1))
    inv = _garner_tables(primes)
    L = len(primes)
    digits = np.zeros_like(residues)
    digits[0] = residues[0]
    # acc[k] = (partial mixed-radix value) mod q_k; prodm[k] = prod_{j<i} q_j mod q_k
    acc = residues[0:1] % primes_np          # broadcast digit0 mod every prime
    acc = np.broadcast_to(acc, residues.shape).copy()
    prodm = np.ones((L,), dtype=np.uint64)
    for i in range(1, L):
        qi = np.uint64(primes[i])
        for k in range(L):
            prodm[k] = (prodm[k] * np.uint64(primes[i - 1])) % np.uint64(primes[k])
        diff = (residues[i] + qi - acc[i]) % qi
        digits[i] = (diff * np.uint64(inv[i])) % qi
        if i + 1 < L:
            d_mod = digits[i][None] % primes_np   # digit i reduced mod every prime
            pm = prodm.reshape(primes_np.shape)
            acc = (acc + (d_mod * pm) % primes_np) % primes_np
    return digits


def crt_to_centered_float(residues: np.ndarray, primes: tuple[int, ...],
                          max_abs_bits: int = 58) -> np.ndarray:
    """CRT-reconstruct centered values as float64.

    residues: uint64 [L, N].  Assumes |centered value| < 2^max_abs_bits
    (true for decrypted CKKS coefficients: message*scale + noise).  Uses
    Garner digits for the positive branch and Garner of the negated residues
    for the negative branch, selected by the top digit.
    """
    primes_np = np.asarray(primes, dtype=np.uint64)
    L = len(primes)
    pos_d = _garner_digits(residues, primes)
    neg_res = (primes_np[:, None] - residues) % primes_np[:, None]
    neg_d = _garner_digits(neg_res, primes)
    # sign: value is negative iff top mixed-radix digit is >= q/2 (value close
    # to Q). For small |v| the top digit is 0 (positive) or q_top-1 (negative).
    negative = pos_d[L - 1] >= (primes_np[L - 1] // np.uint64(2))
    radix = 1.0
    pos_f = np.zeros(residues.shape[1:], dtype=np.float64)
    neg_f = np.zeros(residues.shape[1:], dtype=np.float64)
    for i in range(L):
        if radix > 2.0 ** (max_abs_bits + 10):
            break
        pos_f += pos_d[i].astype(np.float64) * radix
        neg_f += neg_d[i].astype(np.float64) * radix
        radix *= float(primes[i])
    return np.where(negative, -neg_f, pos_f)
