"""MXU (systolic-array) negacyclic NTT via 4-step int8-digit matmuls.

The stage-by-stage NTT (core/ntt.py, core/pallas_ntt.py) is bound by butterfly
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

  i.e. two A x A matmuls plus one elementwise twiddle, with the 16-bit
  bit-reversal split as br(i) = br8(i_b)*A + br8(i_a) folded into the
  constant matrices (no gathers, no transposes).  The inverse runs the same
  shape backwards with inverted/negated tables and a 1/A factor per matmul.

Exact integer matmuls on the MXU: operands are balanced radix-128 digit
decompositions (5 int8 digits for q < 2^30).  For constant matrix W and data
X:  W @ X = sum_d (W * 128^d mod q) @ X_d  (mod q), and each premultiplied
constant is itself digit-decomposed, so

      W @ X  =  sum_e 128^e * S_e,    S_e = sum_d W^(d)_e @ X_d,

with the d-sum realized by stacking digits along the contraction axis and the
e-partials stacked along the output axis: ONE [5A, 5A] @ [5A, A] int8 matmul
per step per limb.  |S_e| <= 5A * 64 * 64 < 2^23, exact in int32 (and even in
float32 accumulation, should a backend lack the s8 MXU path).  The partials
are folded back mod q on the VPU with one Barrett + Shoup per digit.

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

RADIX_BITS = 7
RADIX = 1 << RADIX_BITS           # 128: int8-safe balanced digit radix
NDIG = 5                          # ceil(30 / 7): q < 2^30
OFF = np.uint32(1 << 23)          # > max |partial sum| = 5A*64*64 (A<=256)


def _balanced_digits_host(m: np.ndarray) -> np.ndarray:
    """uint array -> int8 [NDIG, *shape], balanced radix-128 digits."""
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


def _const_blocks_left(W: np.ndarray, q: int) -> np.ndarray:
    """Constant matrix for LEFT matmul (W @ data).

    Returns int8 [NDIG*A, NDIG*A]: row block e, col block d holds
    digit_e(W * 128^d mod q); data digits stack along rows (d-major)."""
    A = W.shape[0]
    out = np.zeros((NDIG * A, NDIG * A), dtype=np.int8)
    for d in range(NDIG):
        wd = (W * pow(RADIX, d, q)) % q
        digs = _balanced_digits_host(wd)          # [NDIG, A, A]
        for e in range(NDIG):
            out[e * A:(e + 1) * A, d * A:(d + 1) * A] = digs[e]
    return out


def _const_blocks_right(W: np.ndarray, q: int) -> np.ndarray:
    """Constant matrix for RIGHT matmul (data @ W).

    Returns int8 [NDIG*A, NDIG*A]: row block d, col block e holds
    digit_e(W * 128^d mod q); data digits stack along columns."""
    A = W.shape[0]
    out = np.zeros((NDIG * A, NDIG * A), dtype=np.int8)
    for d in range(NDIG):
        wd = (W * pow(RADIX, d, q)) % q
        digs = _balanced_digits_host(wd)
        for e in range(NDIG):
            out[d * A:(d + 1) * A, e * A:(e + 1) * A] = digs[e]
    return out


@functools.lru_cache(maxsize=None)
def build_tables(n: int, primes: tuple[int, ...],
                 psis: tuple[int, ...]) -> dict:
    """Host numpy tables for the 4-step MXU NTT (per-prime leading axis).

    Keys (A = sqrt(N)):
      f, g   : int8 [L, 5A, 5A]  forward step-1 (left) / step-3 (right)
      gi, fi : int8 [L, 5A, 5A]  inverse step-1 (right) / step-3 (left)
      t_w/t_sh, ti_w/ti_sh : uint32 [L, A, A]  mid twiddles (Shoup pairs)
      c_w/c_sh : uint32 [L, NDIG]  128^e mod q (Shoup pairs)
      off      : uint32 [L]        sum_e 128^e * OFF mod q
    """
    logn = n.bit_length() - 1
    assert logn % 2 == 0, "MXU NTT requires even log2(N)"
    A = 1 << (logn // 2)
    two_n = 2 * n
    L = len(primes)
    br = bit_reverse_perm(A)
    n_idx = np.arange(A, dtype=np.int64)
    f = np.zeros((L, NDIG * A, NDIG * A), dtype=np.int8)
    g = np.zeros((L, NDIG * A, NDIG * A), dtype=np.int8)
    gi = np.zeros((L, NDIG * A, NDIG * A), dtype=np.int8)
    fi = np.zeros((L, NDIG * A, NDIG * A), dtype=np.int8)
    t_w = np.zeros((L, A, A), dtype=np.uint32)
    t_sh = np.zeros((L, A, A), dtype=np.uint32)
    ti_w = np.zeros((L, A, A), dtype=np.uint32)
    ti_sh = np.zeros((L, A, A), dtype=np.uint32)
    c_w = np.zeros((L, NDIG), dtype=np.uint32)
    c_sh = np.zeros((L, NDIG), dtype=np.uint32)
    off = np.zeros((L,), dtype=np.uint32)
    for li, (q, psi) in enumerate(zip(primes, psis)):
        # psi power table over Z_{2N}
        pw = np.ones(two_n, dtype=np.uint64)
        acc = 1
        for j in range(1, two_n):
            acc = acc * psi % q
            pw[j] = acc
        odd = 2 * br + 1                                   # [A]
        # F1[i_a, n2] = psi^(A*n2*(2 br(i_a)+1))
        F1 = pw[(A * np.outer(odd, n_idx)) % two_n]
        # T[i_a, n1] = psi^(n1*(2 br(i_a)+1))
        T = pw[np.outer(odd, n_idx) % two_n]
        # G[n1, i_b] = psi^(2 A n1 br(i_b))
        G = pw[(2 * A * np.outer(n_idx, br)) % two_n]
        ainv = pow(A, -1, q)
        # inverse: negated exponents, 1/A per matmul stage
        Gi = (pw[(-2 * A * np.outer(br, n_idx)) % two_n] * ainv) % q
        Ti = pw[(-np.outer(odd, n_idx)) % two_n]
        Fi = (pw[(-A * np.outer(n_idx, odd)) % two_n] * ainv) % q
        f[li] = _const_blocks_left(F1, q)
        g[li] = _const_blocks_right(G, q)
        gi[li] = _const_blocks_right(Gi, q)
        fi[li] = _const_blocks_left(Fi, q)
        t_w[li] = T.astype(np.uint32)
        ti_w[li] = Ti.astype(np.uint32)
        qq = np.uint64(q)
        t_sh[li] = ((T << np.uint64(32)) // qq).astype(np.uint32)
        ti_sh[li] = ((Ti << np.uint64(32)) // qq).astype(np.uint32)
        for e in range(NDIG):
            ce = pow(RADIX, e, q)
            c_w[li, e] = ce
            c_sh[li, e] = rns.shoup_precompute(ce, q)
        s = sum(pow(RADIX, e, q) for e in range(NDIG))
        off[li] = (s * int(OFF)) % q
    return dict(f=f, g=g, gi=gi, fi=fi, t_w=t_w, t_sh=t_sh, ti_w=ti_w,
                ti_sh=ti_sh, c_w=c_w, c_sh=c_sh, off=off,
                q=np.asarray(primes, dtype=np.uint32),
                magic=np.asarray([rns.barrett_magic(q) for q in primes],
                                 dtype=np.uint32))


# ---------------------------------------------------------------------------
# Device side
# ---------------------------------------------------------------------------

def _digits_dev(x):
    """uint32 [..., R, C] -> int8 [..., NDIG, R, C] balanced digits."""
    outs = []
    u = x
    mask = jnp.uint32(RADIX - 1)
    for j in range(NDIG - 1):
        r = u & mask
        b = (r >= (RADIX // 2)).astype(jnp.uint32)
        outs.append((r.astype(jnp.int32) - jnp.int32(RADIX) *
                     b.astype(jnp.int32)).astype(jnp.int8))
        u = (u >> RADIX_BITS) + b
    outs.append(u.astype(jnp.int8))
    return jnp.stack(outs, axis=-3)


def _combine(s_parts, mx, q):
    """int32 partials [..., NDIG, R, C] -> uint32 mod q [..., R, C].

    val = sum_e 128^e * S_e mod q, via m_e = Barrett(S_e + OFF) and a Shoup
    combine, correcting the OFF bias once at the end."""
    extra = s_parts.ndim - 4                    # dims before (L, NDIG, R, C)
    def ex(a, tail):                            # [L, ...] -> broadcastable
        return a.reshape((1,) * extra + a.shape[:1] + tail)
    magic = ex(mx["magic"], (1, 1))
    qv = ex(q, (1, 1))
    shifted = (s_parts + jnp.int32(OFF)).astype(jnp.uint32)
    acc = None
    for e in range(NDIG):
        m_e = rns.barrett_reduce(shifted[..., e, :, :], qv, magic)
        if e == 0:
            acc = m_e
        else:
            c_w = ex(mx["c_w"][:, e], (1, 1))
            c_sh = ex(mx["c_sh"][:, e], (1, 1))
            acc = rns.add_mod(acc, rns.shoup_mul(m_e, c_w, c_sh, qv), qv)
    return rns.sub_mod(acc, ex(mx["off"], (1, 1)), qv)


def _einsum_i8(spec, a, b):
    return jnp.einsum(spec, a, b, preferred_element_type=jnp.int32)


def ntt_fwd_mxu(x, mx):
    """x uint32 [..., L, N] Montgomery natural order -> bitrev eval order.

    Bit-identical to ntt.ntt_fwd (same twiddle/psi tables via params)."""
    L, n = x.shape[-2], x.shape[-1]
    A = int(np.sqrt(n))
    assert A * A == n
    q = mx["q"]
    lead = x.shape[:-2]
    z = x.reshape(lead + (L, A, A))
    # digit-major row stacking: row index (d*A + n2) matches f's col blocks
    zd = _digits_dev(z).reshape(lead + (L, NDIG * A, A))
    s1 = _einsum_i8("lij,...ljk->...lik", mx["f"], zd)   # [..., L, 5A, A]
    s1 = s1.reshape(lead + (L, NDIG, A, A))
    S = _combine(s1, mx, q)                              # [..., L, A, A]
    qv = q.reshape((1,) * len(lead) + (L, 1, 1))
    B = rns.shoup_mul(S, mx["t_w"], mx["t_sh"], qv)
    bd = _digits_dev(B)                                  # [..., L, 5, A, A]
    bd = jnp.moveaxis(bd, -3, -2).reshape(lead + (L, A, NDIG * A))
    s2 = _einsum_i8("...lij,ljk->...lik", bd, mx["g"])   # [..., L, A, 5A]
    s2 = jnp.moveaxis(s2.reshape(lead + (L, A, NDIG, A)), -2, -3)
    out = _combine(s2, mx, q)
    return out.reshape(lead + (L, n))


def ntt_inv_mxu(x, mx):
    """Inverse: bitrev eval order -> natural coeff order (incl. 1/N)."""
    L, n = x.shape[-2], x.shape[-1]
    A = int(np.sqrt(n))
    assert A * A == n
    q = mx["q"]
    lead = x.shape[:-2]
    out_m = x.reshape(lead + (L, A, A))
    od = _digits_dev(out_m)
    od = jnp.moveaxis(od, -3, -2).reshape(lead + (L, A, NDIG * A))
    s1 = _einsum_i8("...lij,ljk->...lik", od, mx["gi"])
    s1 = jnp.moveaxis(s1.reshape(lead + (L, A, NDIG, A)), -2, -3)
    B = _combine(s1, mx, q)
    qv = q.reshape((1,) * len(lead) + (L, 1, 1))
    S = rns.shoup_mul(B, mx["ti_w"], mx["ti_sh"], qv)
    sd = _digits_dev(S).reshape(lead + (L, NDIG * A, A))
    s2 = _einsum_i8("lij,...ljk->...lik", mx["fi"], sd)
    s2 = s2.reshape(lead + (L, NDIG, A, A))
    z = _combine(s2, mx, q)
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
