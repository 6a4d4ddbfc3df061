"""MXU (systolic-array) negacyclic NTT via 4-step int8-digit matmuls.

The stage-by-stage NTT (core/ntt.py) is bound by butterfly
data movement on the VPU: 16 stages each rewrite the whole polynomial with
cross-lane shuffles.  This module instead maps the transform onto the MXU,
where the TPU's integer throughput is ~2 orders of magnitude higher:

  N = A*A (logN even).  Writing n = n1 + A*n2, i = A*i_a + i_b, the
  merged-twist negacyclic NTT  out[i] = sum_n x[n] * psi^(n*(2*br(i)+1))
  factors as (all mod q):

      Z   = reshape(x, (A, A))                  # Z[n2, n1]
      S   = F1 @ Z          F1[i_a, n2] = psi^(A*n2*(2*br(i_a)+1))
      B   = S * T           T [i_a, n1] = psi^(n1*(2*br(i_a)+1))
      Out = B @ G           G [n1, i_b] = psi^(2*A*n1*br(i_b))
      out = reshape(Out, (N,))

  i.e. two A x A matmuls plus one elementwise twiddle, with the bit-reversal
  split br(i) = br8(i_b)*A + br8(i_a) folded into the constant matrices (no
  gathers, no transposes).  The inverse runs the same shape backwards with
  inverted/negated tables and a 1/A factor per matmul.

Exact integer matmuls on the MXU, radix 256: the uint32 data is reinterpreted
as its 4 little-endian bytes (a free bitcast — no digit arithmetic), bias-
flipped to int8 (b XOR 0x80 = b - 128), and stacked along the contraction
axis.  Constant matrices are premultiplied by 256^d mod q per data digit d
and balanced-decomposed into 4 int8 digits e, so

      W @ X = sum_e 256^e * S_e,   S_e = sum_d W^(d)_e @ (X_d - 128),

one [4A, 4A] @ [4A, A] int8->int32 matmul per step per limb.  The -128 bias
contributes a per-row constant (128 * row-sum of W^(d)_e), precomputed into
`fcorr`/`gcorr` and folded into the mod-q reduction.  |S_e| <= 4A*128*255
< 2^26, exact in int32.  Partials fold back mod q on the VPU with one
Barrett + Shoup per digit.

Montgomery convention: data in Montgomery form, constants plain — identical
to the Shoup-twiddle contract of core/ntt.py, so results are bit-identical
to ntt_fwd/ntt_inv (asserted in tests/test_ntt.py).

Replaces the NTT inside the reference's closed-source `desilofhe` engine
(SURVEY.md section 2.1; /root/reference/engine_context.py:6) — this is the
"keep the FLOPs on the MXU" requirement of the TPU-first build brief.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from . import rns
from .ntt import bit_reverse_perm

RADIX_BITS = 8
RADIX = 1 << RADIX_BITS           # 256: digits are raw little-endian bytes
NDIG = 4                          # 4 bytes per uint32
OFF = np.int64(1 << 26)           # > max |true partial| = 4A*128*255 (A<=256)


def _balanced_digits_host(m: np.ndarray) -> np.ndarray:
    """uint array (< 2^30) -> int8 [NDIG, *shape], balanced radix-256."""
    u = m.astype(np.int64)
    digs = np.zeros((NDIG,) + m.shape, dtype=np.int8)
    for j in range(NDIG - 1):
        r = u & (RADIX - 1)
        b = (r >= RADIX // 2).astype(np.int64)
        digs[j] = (r - RADIX * b).astype(np.int8)
        u = (u >> RADIX_BITS) + b
    assert u.max() <= 127 and u.min() >= 0
    digs[NDIG - 1] = u.astype(np.int8)
    return digs


def _const_blocks(W: np.ndarray, q: int, left: bool):
    """Digit-expand constant matrix W for an exact int8 matmul.

    left=True  (W @ data): returns [NDIG*A, NDIG*A] with row block e / col
      block d = digit_e(W * 256^d mod q), plus corr [NDIG, A] row-sums.
    left=False (data @ W): transposed block layout (row block d / col block
      e), corr = column-sums.
    Both corr arrays hold 128 * sum-over-contraction of the block, i.e. the
    contribution of the +128 byte bias removed from the data digits.
    """
    A = W.shape[0]
    out = np.zeros((NDIG * A, NDIG * A), dtype=np.int8)
    corr = np.zeros((NDIG, A), dtype=np.int64)
    for d in range(NDIG):
        wd = (W * pow(RADIX, d, q)) % q
        digs = _balanced_digits_host(wd)          # [NDIG, A, A]
        for e in range(NDIG):
            if left:
                out[e * A:(e + 1) * A, d * A:(d + 1) * A] = digs[e]
                corr[e] += 128 * digs[e].astype(np.int64).sum(axis=1)
            else:
                out[d * A:(d + 1) * A, e * A:(e + 1) * A] = digs[e]
                corr[e] += 128 * digs[e].astype(np.int64).sum(axis=0)
    assert np.abs(corr).max() < (1 << 31) - int(OFF)
    return out, (corr + int(OFF)).astype(np.int32)


@functools.lru_cache(maxsize=None)
def build_tables(n: int, primes: tuple[int, ...],
                 psis: tuple[int, ...]) -> dict:
    """Host numpy tables for the 4-step MXU NTT (per-prime leading axis).

    Keys (A = sqrt(N)):
      f, g   : int8 [L, 4A, 4A]  forward step-1 (left) / step-3 (right)
      gi, fi : int8 [L, 4A, 4A]  inverse step-1 (right) / step-3 (left)
      fcorr/gcorr/gicorr/ficorr : int32 [L, NDIG, A] bias corrections (+OFF)
      t_w/t_sh, ti_w/ti_sh : uint32 [L, A, A]  mid twiddles (Shoup pairs)
      c_w/c_sh : uint32 [L, NDIG]  256^e mod q (Shoup pairs)
      off      : uint32 [L]        sum_e 256^e * OFF mod q
    """
    logn = n.bit_length() - 1
    assert logn % 2 == 0, "MXU NTT requires even log2(N)"
    A = 1 << (logn // 2)
    two_n = 2 * n
    L = len(primes)
    br = bit_reverse_perm(A)
    n_idx = np.arange(A, dtype=np.int64)
    out = dict(
        f=np.zeros((L, NDIG * A, NDIG * A), dtype=np.int8),
        g=np.zeros((L, NDIG * A, NDIG * A), dtype=np.int8),
        gi=np.zeros((L, NDIG * A, NDIG * A), dtype=np.int8),
        fi=np.zeros((L, NDIG * A, NDIG * A), dtype=np.int8),
        fcorr=np.zeros((L, NDIG, A), dtype=np.int32),
        gcorr=np.zeros((L, NDIG, A), dtype=np.int32),
        gicorr=np.zeros((L, NDIG, A), dtype=np.int32),
        ficorr=np.zeros((L, NDIG, A), dtype=np.int32),
        t_w=np.zeros((L, A, A), dtype=np.uint32),
        t_sh=np.zeros((L, A, A), dtype=np.uint32),
        ti_w=np.zeros((L, A, A), dtype=np.uint32),
        ti_sh=np.zeros((L, A, A), dtype=np.uint32),
        c_w=np.zeros((L, NDIG), dtype=np.uint32),
        c_sh=np.zeros((L, NDIG), dtype=np.uint32),
        off=np.zeros((L,), dtype=np.uint32),
        q=np.asarray(primes, dtype=np.uint32),
        magic=np.asarray([rns.barrett_magic(q) for q in primes],
                         dtype=np.uint32))
    for li, (q, psi) in enumerate(zip(primes, psis)):
        pw = np.ones(two_n, dtype=np.uint64)
        acc = 1
        for j in range(1, two_n):
            acc = acc * psi % q
            pw[j] = acc
        odd = 2 * br + 1                                   # [A]
        F1 = pw[(A * np.outer(odd, n_idx)) % two_n]
        T = pw[np.outer(odd, n_idx) % two_n]
        G = pw[(2 * A * np.outer(n_idx, br)) % two_n]
        ainv = pow(A, -1, q)
        Gi = (pw[(-2 * A * np.outer(br, n_idx)) % two_n] * ainv) % q
        Ti = pw[(-np.outer(odd, n_idx)) % two_n]
        Fi = (pw[(-A * np.outer(n_idx, odd)) % two_n] * ainv) % q
        out["f"][li], out["fcorr"][li] = _const_blocks(F1, q, left=True)
        out["g"][li], out["gcorr"][li] = _const_blocks(G, q, left=False)
        out["gi"][li], out["gicorr"][li] = _const_blocks(Gi, q, left=False)
        out["fi"][li], out["ficorr"][li] = _const_blocks(Fi, q, left=True)
        out["t_w"][li] = T.astype(np.uint32)
        out["ti_w"][li] = Ti.astype(np.uint32)
        qq = np.uint64(q)
        out["t_sh"][li] = ((T << np.uint64(32)) // qq).astype(np.uint32)
        out["ti_sh"][li] = ((Ti << np.uint64(32)) // qq).astype(np.uint32)
        for e in range(NDIG):
            ce = pow(RADIX, e, q)
            out["c_w"][li, e] = ce
            out["c_sh"][li, e] = rns.shoup_precompute(ce, q)
        s = sum(pow(RADIX, e, q) for e in range(NDIG))
        out["off"][li] = (s * int(OFF)) % q
    return out


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------

def _byte_digits(x):
    """uint32 [..., R, C] -> int8 [..., R, C, NDIG]: little-endian bytes with
    the +128 bias flipped off (b XOR 0x80 reinterpreted as int8 = b - 128).
    No arithmetic digit loop — one XOR and a bitcast."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint8)       # [..., R, C, 4]
    return jax.lax.bitcast_convert_type(b ^ jnp.uint8(0x80), jnp.int8)


def _digits_rows(x, lead, L, A):
    """-> int8 [..., L, NDIG*A, A] (digit-major row stacking)."""
    d = _byte_digits(x)                                   # [..., L, A, A, 4]
    d = jnp.moveaxis(d, -1, -3)                           # [..., L, 4, A, A]
    return d.reshape(lead + (L, NDIG * A, A))


def _digits_cols(x, lead, L, A):
    """-> int8 [..., L, A, NDIG*A] (digit-major column stacking)."""
    d = _byte_digits(x)                                   # [..., L, A, A, 4]
    d = jnp.moveaxis(d, -1, -2)                           # [..., L, A, 4, A]
    return d.reshape(lead + (L, A, NDIG * A))


def _combine(s_parts, corr, mx, rowwise: bool, digit_axis: int = -3):
    """int32 partials with a digit axis -> uint32 mod q [..., L, R, C].

    val = sum_e 256^e * (S_e + corr_e - OFF) mod q: corr (int32 [L, NDIG, A],
    already + OFF) restores the byte-bias contribution; m_e = Barrett(S_e +
    corr_e), then a Shoup combine subtracts the OFF bias once at the end.

    `digit_axis` gives the NDIG axis position: -3 for [..., L, NDIG, R, C]
    (step-1 layout) or -2 for [..., L, R, NDIG, C] (step-2 einsum output,
    consumed IN PLACE — transposing it first would materialize the 4x-size
    int32 partials through HBM just to rearrange them, which measured as
    ~35% of the whole NTT kernel)."""
    assert digit_axis in (-3, -2)
    extra = s_parts.ndim - 4                    # dims before the last four
    L, nd, a = corr.shape
    magic = mx["magic"].reshape((1,) * extra + (-1, 1, 1))
    qv = mx["q"].reshape((1,) * extra + (-1, 1, 1))
    acc = None
    for e in range(NDIG):
        s_e = (s_parts[..., e, :, :] if digit_axis == -3
               else s_parts[..., :, e, :])                  # [..., L, R|A, C]
        corr_e = corr[:, e].reshape((1,) * extra + ((L, a, 1) if rowwise
                                                    else (L, 1, a)))
        m_e = rns.barrett_reduce((s_e + corr_e).astype(jnp.uint32), qv, magic)
        if e == 0:
            acc = m_e
        else:
            c_w = mx["c_w"][:, e].reshape((1,) * extra + (-1, 1, 1))
            c_sh = mx["c_sh"][:, e].reshape((1,) * extra + (-1, 1, 1))
            acc = rns.add_mod(acc, rns.shoup_mul(m_e, c_w, c_sh, qv), qv)
    off = mx["off"].reshape((1,) * extra + (-1, 1, 1))
    return rns.sub_mod(acc, off, qv)


def _einsum_i8(spec, a, b):
    return jnp.einsum(spec, a, b, preferred_element_type=jnp.int32)


def ntt_fwd_mxu(x, mx):
    """x uint32 [..., L, N] Montgomery natural order -> bitrev eval order.

    Bit-identical to ntt.ntt_fwd (same twiddle/psi tables via params)."""
    L, n = x.shape[-2], x.shape[-1]
    A = int(np.sqrt(n))
    assert A * A == n
    lead = x.shape[:-2]
    z = x.reshape(lead + (L, A, A))
    zd = _digits_rows(z, lead, L, A)
    s1 = _einsum_i8("lij,...ljk->...lik", mx["f"], zd)   # [..., L, 4A, A]
    s1 = s1.reshape(lead + (L, NDIG, A, A))
    S = _combine(s1, mx["fcorr"], mx, rowwise=True)
    qv = mx["q"].reshape((1,) * len(lead) + (L, 1, 1))
    B = rns.shoup_mul(S, mx["t_w"], mx["t_sh"], qv)
    bd = _digits_cols(B, lead, L, A)
    s2 = _einsum_i8("...lij,ljk->...lik", bd, mx["g"])   # [..., L, A, 4A]
    s2 = s2.reshape(lead + (L, A, NDIG, A))              # free (contiguous)
    out = _combine(s2, mx["gcorr"], mx, rowwise=False, digit_axis=-2)
    return out.reshape(lead + (L, n))


def ntt_inv_mxu(x, mx):
    """Inverse: bitrev eval order -> natural coeff order (incl. 1/N)."""
    L, n = x.shape[-2], x.shape[-1]
    A = int(np.sqrt(n))
    assert A * A == n
    lead = x.shape[:-2]
    out_m = x.reshape(lead + (L, A, A))
    od = _digits_cols(out_m, lead, L, A)
    s1 = _einsum_i8("...lij,ljk->...lik", od, mx["gi"])
    s1 = s1.reshape(lead + (L, A, NDIG, A))
    B = _combine(s1, mx["gicorr"], mx, rowwise=False, digit_axis=-2)
    qv = mx["q"].reshape((1,) * len(lead) + (L, 1, 1))
    S = rns.shoup_mul(B, mx["ti_w"], mx["ti_sh"], qv)
    sd = _digits_rows(S, lead, L, A)
    s2 = _einsum_i8("lij,...ljk->...lik", mx["fi"], sd)
    s2 = s2.reshape(lead + (L, NDIG, A, A))
    z = _combine(s2, mx["ficorr"], mx, rowwise=True)
    return z.reshape(lead + (L, n))


def enabled_for(n: int) -> bool:
    """MXU path policy: TPU backend, even log2(N), not tiny; env-overridable
    (AESFHE_MXU_NTT=1 forces on — used by CPU correctness tests — =0 off)."""
    env = os.environ.get("AESFHE_MXU_NTT", "auto")
    logn = n.bit_length() - 1
    if logn % 2 != 0:
        return False
    if env == "1":
        return True
    if env == "0":
        return False
    return jax.default_backend() not in ("cpu",) and n >= 4096
