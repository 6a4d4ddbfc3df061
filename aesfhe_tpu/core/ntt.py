"""Negacyclic NTT over RNS limbs, vectorized for TPU (XLA).

The polynomial ring is Z_q[X]/(X^N + 1).  The forward transform evaluates a
polynomial at the N primitive 2N-th roots psi^(2i+1); multiplication of
ciphertext polynomials is then pointwise.  We use the classic iterative
Cooley-Tukey decimation with merged psi-twist (Longa-Naehrig style): input in
natural coefficient order, output in bit-reversed evaluation order.  The
inverse uses Gentleman-Sande butterflies consuming bit-reversed order.

All device data is uint32 in Montgomery form; twiddles are plain-domain
constants applied with Shoup multiplication (see core/rns.py), which maps
Montgomery inputs to Montgomery outputs.

Everything is shaped [..., N] and the stage loop is a Python loop that XLA
unrolls and fuses; the production TPU path replaces the butterfly network
entirely with int8 MXU matmuls (see aesfhe_tpu/core/mxu_ntt.py).

This replaces the native NTT inside the reference's `desilofhe` engine
(SURVEY.md section 2.1, "north star" in BASELINE.json).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from . import rns


def bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class NTTTables:
    """Per-prime twiddle tables (host numpy, shipped to device as constants).

    For prime q with primitive 2N-th root psi:
      fwd stage m (m = 1, 2, 4, ... N/2 groups):
        twiddle for group i is psi_br[m + i] = psi^(rev(m+i) interpretation)
        -- we use the standard table W[j] = psi^(bitrev_{log2N+?}(j)) layout.
    """

    def __init__(self, n: int, primes: tuple[int, ...]):
        self.n = n
        self.primes = primes
        self.logn = n.bit_length() - 1
        L = len(primes)
        self.psi = []
        # Tables indexed [L, N]: psi powers in "bit-reversed" CT order.
        w = np.zeros((L, n), dtype=np.uint32)
        w_sh = np.zeros((L, n), dtype=np.uint32)
        wi = np.zeros((L, n), dtype=np.uint32)
        wi_sh = np.zeros((L, n), dtype=np.uint32)
        ninv = np.zeros((L,), dtype=np.uint32)
        ninv_sh = np.zeros((L,), dtype=np.uint32)
        rev = bit_reverse_perm(n)

        def pow_table(base: int, q: int) -> np.ndarray:
            """[1, base, base^2, ..., base^(n-1)] mod q, vectorized uint64
            doubling (products < 2^60 stay exact in uint64)."""
            out = np.ones(1, dtype=np.uint64)
            b = np.uint64(base)
            qq = np.uint64(q)
            while out.size < n:
                step = (np.uint64(pow(base, out.size, q)))
                out = np.concatenate([out, (out * step) % qq])
            return out[:n]

        for li, q in enumerate(primes):
            psi = rns._find_primitive_2n_root(q, 2 * n)
            self.psi.append(psi)
            psi_inv = pow(psi, -1, q)
            pw = pow_table(psi, q)
            pwi = pow_table(psi_inv, q)
            # standard Harvey/SEAL table: root_powers[rev(j)] = psi^j
            w[li, rev] = pw.astype(np.uint32)
            wi[li, rev] = pwi.astype(np.uint32)
            qq = np.uint64(q)
            w_sh[li] = ((w[li].astype(np.uint64) << np.uint64(32)) // qq
                        ).astype(np.uint32)
            wi_sh[li] = ((wi[li].astype(np.uint64) << np.uint64(32)) // qq
                         ).astype(np.uint32)
            ni = pow(n, -1, q)
            ninv[li] = ni
            ninv_sh[li] = rns.shoup_precompute(ni, q)
        self.w = w                    # [L, N]  psi^j at bit-reversed slot
        self.w_sh = w_sh
        self.wi = wi
        self.wi_sh = wi_sh
        self.ninv = ninv              # [L]
        self.ninv_sh = ninv_sh
        self.q = np.asarray(primes, dtype=np.uint32)


def _stage_slices(n: int, inverse: bool):
    """Yield (m, t) for each butterfly stage."""
    if not inverse:
        t = n
        m = 1
        while m < n:
            t //= 2
            yield m, t
            m *= 2
    else:
        t = 1
        m = n // 2
        while m >= 1:
            yield m, t
            t *= 2
            m //= 2


def ntt_fwd_unrolled(x, w, w_sh, q):
    """Forward negacyclic NTT, stages unrolled (reshape-based butterflies).

    x: uint32 [..., L, N] (Montgomery form, natural coeff order)
    w, w_sh: twiddle tables [L, N]; q: moduli [L].
    returns uint32 [..., L, N] (Montgomery form, bit-reversed eval order).
    """
    n = x.shape[-1]
    L = x.shape[-2]
    qc = q.reshape((L, 1, 1))
    for m, t in _stage_slices(n, inverse=False):
        xr = x.reshape(x.shape[:-1] + (m, 2, t))
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        tw = w[..., m:2 * m].reshape((L, m, 1))
        tw_sh = w_sh[..., m:2 * m].reshape((L, m, 1))
        wv = rns.shoup_mul(v, tw, tw_sh, qc)
        new_u = rns.add_mod(u, wv, qc)
        new_v = rns.sub_mod(u, wv, qc)
        x = jnp.stack([new_u, new_v], axis=-2).reshape(x.shape)
    return x


def ntt_inv_unrolled(x, wi, wi_sh, q, ninv, ninv_sh):
    """Inverse negacyclic NTT: bit-reversed eval order -> natural coeff order."""
    n = x.shape[-1]
    L = x.shape[-2]
    qc = q.reshape((L, 1, 1))
    for m, t in _stage_slices(n, inverse=True):
        xr = x.reshape(x.shape[:-1] + (m, 2, t))
        u = xr[..., 0, :]
        v = xr[..., 1, :]
        tw = wi[..., m:2 * m].reshape((L, m, 1))
        tw_sh = wi_sh[..., m:2 * m].reshape((L, m, 1))
        new_u = rns.add_mod(u, v, qc)
        diff = rns.sub_mod(u, v, qc)
        new_v = rns.shoup_mul(diff, tw, tw_sh, qc)
        x = jnp.stack([new_u, new_v], axis=-2).reshape(x.shape)
    qflat = q.reshape((L, 1))
    ni = ninv.reshape((L, 1))
    ni_sh = ninv_sh.reshape((L, 1))
    return rns.shoup_mul(x, ni, ni_sh, qflat)


def _use_loop_ntt() -> bool:
    """Backend-dependent NTT strategy: the fori_loop form compiles ~logN x
    faster (one stage body) but its lane-axis gathers run ~300x slower on
    TPU; the unrolled reshape form is near memory-bound on TPU.  CPU (tests)
    is compile-dominated, TPU (bench/serving) is runtime-dominated."""
    import jax
    return jax.default_backend() == "cpu"


def ntt_fwd(x, w, w_sh, q):
    if not _use_loop_ntt():
        return ntt_fwd_unrolled(x, w, w_sh, q)
    return ntt_fwd_loop(x, w, w_sh, q)


def ntt_inv(x, wi, wi_sh, q, ninv, ninv_sh):
    if not _use_loop_ntt():
        return ntt_inv_unrolled(x, wi, wi_sh, q, ninv, ninv_sh)
    return ntt_inv_loop(x, wi, wi_sh, q, ninv, ninv_sh)


def ntt_fwd_loop(x, w, w_sh, q):
    """Forward NTT as a constant-shape fori_loop (gather-based butterflies).

    Every stage has identical shapes, so XLA compiles ONE stage body instead
    of logN unrolled stages -- service-level circuits inline dozens of NTTs,
    and the unrolled form made their graphs (and compile times) explode.
    Output/layout identical to ntt_fwd_unrolled (asserted in tests/test_ntt).
    """
    import jax
    n = x.shape[-1]
    logn = n.bit_length() - 1
    L = x.shape[-2]
    qc = q.reshape((L, 1))
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def stage(s, xv):
        t = jnp.int32(n) >> (s + 1)             # butterfly half-distance
        m = jnp.int32(1) << s
        partner = jnp.bitwise_xor(j, t)          # [1, N]
        pv = jnp.take_along_axis(xv, jnp.broadcast_to(partner, xv.shape),
                                 axis=-1)
        is_hi = (j & t) != 0
        u = jnp.where(is_hi, pv, xv)
        v = jnp.where(is_hi, xv, pv)
        tw_idx = m + (j >> (logn - s))           # group twiddle index [1, N]
        tw_b = jnp.broadcast_to(tw_idx, xv.shape)
        tw = jnp.take_along_axis(jnp.broadcast_to(w, xv.shape[:-2] + w.shape),
                                 tw_b, axis=-1)
        tw_sh = jnp.take_along_axis(
            jnp.broadcast_to(w_sh, xv.shape[:-2] + w_sh.shape), tw_b, axis=-1)
        wv = rns.shoup_mul(v, tw, tw_sh, qc)
        return jnp.where(is_hi, rns.sub_mod(u, wv, qc),
                         rns.add_mod(u, wv, qc))

    return jax.lax.fori_loop(0, logn, stage, x)


def ntt_inv_loop(x, wi, wi_sh, q, ninv, ninv_sh):
    """Inverse NTT as a constant-shape fori_loop (see ntt_fwd_loop)."""
    import jax
    n = x.shape[-1]
    logn = n.bit_length() - 1
    L = x.shape[-2]
    qc = q.reshape((L, 1))
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def stage(k, xv):
        t = jnp.int32(1) << k
        m = jnp.int32(n) >> (k + 1)
        partner = jnp.bitwise_xor(j, t)
        pv = jnp.take_along_axis(xv, jnp.broadcast_to(partner, xv.shape),
                                 axis=-1)
        is_hi = (j & t) != 0
        u = jnp.where(is_hi, pv, xv)
        v = jnp.where(is_hi, xv, pv)
        tw_idx = m + (j >> (k + 1))
        tw_b = jnp.broadcast_to(tw_idx, xv.shape)
        tw = jnp.take_along_axis(
            jnp.broadcast_to(wi, xv.shape[:-2] + wi.shape), tw_b, axis=-1)
        tw_sh = jnp.take_along_axis(
            jnp.broadcast_to(wi_sh, xv.shape[:-2] + wi_sh.shape), tw_b,
            axis=-1)
        s_uv = rns.add_mod(u, v, qc)             # lo output
        d_uv = rns.shoup_mul(rns.sub_mod(u, v, qc), tw, tw_sh, qc)
        return jnp.where(is_hi, d_uv, s_uv)

    out = jax.lax.fori_loop(0, logn, stage, x)
    qflat = q.reshape((L, 1))
    ni = ninv.reshape((L, 1))
    ni_sh = ninv_sh.reshape((L, 1))
    return rns.shoup_mul(out, ni, ni_sh, qflat)


# ---------------------------------------------------------------------------
# Host-side reference model (numpy object ints) for tests and for discovering
# the evaluation-order permutation used by encode/rotations.
# ---------------------------------------------------------------------------

def ntt_fwd_host(coeffs: np.ndarray, q: int, psi: int) -> np.ndarray:
    """O(N log N) host NTT matching ntt_fwd (plain domain, natural->bitrev)."""
    n = len(coeffs)
    rev = bit_reverse_perm(n)
    pw = np.ones(n, dtype=object)
    for j in range(1, n):
        pw[j] = pw[j - 1] * psi % q
    w = np.zeros(n, dtype=object)
    for j in range(n):
        w[rev[j]] = pw[j]
    x = np.array([int(c) % q for c in coeffs], dtype=object)
    t = n
    m = 1
    while m < n:
        t //= 2
        for i in range(m):
            tw = w[m + i]
            for j in range(i * 2 * t, i * 2 * t + t):
                u = x[j]
                v = x[j + t] * tw % q
                x[j] = (u + v) % q
                x[j + t] = (u - v) % q
        m *= 2
    return x


@functools.lru_cache(maxsize=None)
def eval_order_exponents(n: int, q: int, psi: int) -> tuple[int, ...]:
    """exponents[i] = odd e such that output slot i of ntt_fwd holds p(psi^e).

    Discovered empirically by transforming p(X) = X (whose evaluation at
    psi^e is psi^e) and looking each output value up in the psi power table.
    """
    coeffs = np.zeros(n, dtype=object)
    coeffs[1] = 1
    out = ntt_fwd_host(coeffs, q, psi)
    pow_to_exp = {}
    acc = 1
    for e in range(2 * n):
        if acc in pow_to_exp:
            break
        pow_to_exp[acc] = e
        acc = acc * psi % q
    return tuple(pow_to_exp[int(v)] for v in out)
