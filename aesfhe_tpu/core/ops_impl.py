"""Jitted CKKS primitive operations (device side).

Every function here is traced once per (params, shape) combination and
compiled by XLA; the Python loops over RNS limbs / digit groups / NTT stages
unroll into one fused graph per op.  This replaces desilofhe's per-op native
FFI boundary (SURVEY.md section 3: "every eng.* call crosses the Python->native
boundary ... no fusion") with whole-op XLA compilation.

Conventions: uint32 Montgomery form; ciphertext polys in NTT evaluation
domain; `tabs` is a DeviceTables pytree of device-resident constant tables.
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from . import rns, ntt, mxu_ntt, pallas_ks
from .params import CKKSParams


@jax.tree_util.register_pytree_node_class
@dataclass
class DeviceTables:
    w: Any
    w_sh: Any
    wi: Any
    wi_sh: Any
    ninv: Any
    ninv_sh: Any
    q: Any
    qinv: Any
    r2: Any
    magic: Any
    xhalf_sign_neg: Any   # [N] bool: eval slots where X^(N/2) = -zeta4
    mxu: Any = None       # MXU 4-step NTT tables (dict of [L, ...]) or None

    def tree_flatten(self):
        vals = (self.w, self.w_sh, self.wi, self.wi_sh, self.ninv,
                self.ninv_sh, self.q, self.qinv, self.r2, self.magic,
                self.xhalf_sign_neg, self.mxu)
        return vals, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def build(params: CKKSParams) -> "DeviceTables":
        t = params.tables
        mxu = None
        if mxu_ntt.enabled_for(params.n):
            host = mxu_ntt.build_tables(params.n, params.all_primes,
                                        tuple(t.psi))
            mxu = {k: jnp.asarray(v) for k, v in host.items()}
        return DeviceTables(
            w=jnp.asarray(t.w), w_sh=jnp.asarray(t.w_sh),
            wi=jnp.asarray(t.wi), wi_sh=jnp.asarray(t.wi_sh),
            ninv=jnp.asarray(t.ninv), ninv_sh=jnp.asarray(t.ninv_sh),
            q=jnp.asarray(params.q_arr), qinv=jnp.asarray(params.qinv_arr),
            r2=jnp.asarray(params.r2_arr), magic=jnp.asarray(params.magic_arr),
            xhalf_sign_neg=jnp.asarray(params.xhalf_sign_neg), mxu=mxu)


def _rows(params: CKKSParams, level: int, with_special: bool):
    """Row indices into the all_primes axis for the active basis."""
    r = list(range(level + 1))
    if with_special:
        r += list(range(params.num_q, params.L_tot))
    return np.asarray(r, dtype=np.int32)


def _tabs_rows(tabs: DeviceTables, rows):
    ri = jnp.asarray(rows)
    tr = dict(w=tabs.w[ri], w_sh=tabs.w_sh[ri], wi=tabs.wi[ri],
              wi_sh=tabs.wi_sh[ri], ninv=tabs.ninv[ri],
              ninv_sh=tabs.ninv_sh[ri], q=tabs.q[ri], qinv=tabs.qinv[ri],
              r2=tabs.r2[ri], magic=tabs.magic[ri])
    if tabs.mxu is not None:
        tr["mxu"] = {k: v[ri] for k, v in tabs.mxu.items()}
    return tr


def ntt_rows(x, tr):
    if "mxu" in tr:
        return mxu_ntt.ntt_fwd_mxu(x, tr["mxu"])
    return ntt.ntt_fwd(x, tr["w"], tr["w_sh"], tr["q"])


def intt_rows(x, tr):
    if "mxu" in tr:
        return mxu_ntt.ntt_inv_mxu(x, tr["mxu"])
    return ntt.ntt_inv(x, tr["wi"], tr["wi_sh"], tr["q"], tr["ninv"],
                       tr["ninv_sh"])


# ---------------------------------------------------------------------------
# Elementwise ciphertext ops (eval domain)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def ct_add(params: CKKSParams, tabs: DeviceTables, a, b):
    level = a.shape[1] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((1, -1, 1))
    return rns.add_mod(a, b, q)


@functools.partial(jax.jit, static_argnums=0)
def ct_sub(params: CKKSParams, tabs: DeviceTables, a, b):
    level = a.shape[1] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((1, -1, 1))
    return rns.sub_mod(a, b, q)


@functools.partial(jax.jit, static_argnums=0)
def ct_negate(params: CKKSParams, tabs: DeviceTables, a):
    level = a.shape[1] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((1, -1, 1))
    return rns.neg_mod(a, q)


@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.tensor")
def ct_tensor(params: CKKSParams, tabs: DeviceTables, a, b):
    """Degree-1 x degree-1 tensor product -> degree-2 data [3, l+1, N]."""
    level = a.shape[1] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((-1, 1))
    qinv = tr["qinv"].reshape((-1, 1))
    d0 = rns.mont_mul(a[0], b[0], q, qinv)
    cross1 = rns.mont_mul(a[0], b[1], q, qinv)
    cross2 = rns.mont_mul(a[1], b[0], q, qinv)
    d1 = rns.add_mod(cross1, cross2, q)
    d2 = rns.mont_mul(a[1], b[1], q, qinv)
    return jnp.stack([d0, d1, d2])


@functools.partial(jax.jit, static_argnums=0)
def ct_mul_dense_pt(params: CKKSParams, tabs: DeviceTables, a, pt):
    """ct [k, l+1, N] x dense plaintext [l+1, N]."""
    level = a.shape[1] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((1, -1, 1))
    qinv = tr["qinv"].reshape((1, -1, 1))
    return rns.mont_mul(a, pt[None], q, qinv)


@functools.partial(jax.jit, static_argnums=0)
def ct_mul_scalar_pt(params: CKKSParams, tabs: DeviceTables, a, consts):
    """ct x slot-constant complex plaintext.

    consts: uint32 [l+1, 4]: columns (re_w, re_shoup, imz_w, imz_shoup) where
    re = round(Re(c)*scale) mod q and imz = round(Im(c)*scale)*zeta4 mod q.
    Eval of the plaintext at slot i is re + s_i*imz with s_i = +-1
    (tabs.xhalf_sign_neg); multiply distributes over the two terms.
    """
    level = a.shape[1] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((1, -1, 1))
    re_w = consts[:, 0].reshape((1, -1, 1))
    re_sh = consts[:, 1].reshape((1, -1, 1))
    imz_w = consts[:, 2].reshape((1, -1, 1))
    imz_sh = consts[:, 3].reshape((1, -1, 1))
    t_re = rns.shoup_mul(a, re_w, re_sh, q)
    t_im = rns.shoup_mul(a, imz_w, imz_sh, q)
    neg = tabs.xhalf_sign_neg[None, None, :]
    return jnp.where(neg, rns.sub_mod(t_re, t_im, q),
                     rns.add_mod(t_re, t_im, q))


@functools.partial(jax.jit, static_argnums=0)
def ct_add_scalar_pt(params: CKKSParams, tabs: DeviceTables, a, consts_mont):
    """ct + slot-constant complex plaintext.

    consts_mont: uint32 [l+1, 2]: (re_mont, imz_mont) -- Montgomery-form
    integers round(Re(c)*scale) and round(Im(c)*scale)*zeta4 mod q.  Only the
    degree-0 component changes.
    """
    level = a.shape[1] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((-1, 1))
    re_m = consts_mont[:, 0].reshape((-1, 1))
    imz_m = consts_mont[:, 1].reshape((-1, 1))
    neg = tabs.xhalf_sign_neg[None, :]
    pt_eval = jnp.where(neg, rns.sub_mod(re_m, imz_m, q),
                        rns.add_mod(re_m, imz_m, q))
    c0 = rns.add_mod(a[0], pt_eval, q)
    return a.at[0].set(c0)


@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.linear_combo")
def ct_linear_combo(params: CKKSParams, tabs: DeviceTables, stack, consts):
    """sum_k stack[k] * scalar_pt(consts[k]) -- fused LUT-sum kernel.

    stack: [K, deg+1, l+1, N]; consts: [K, l+1, 4] Shoup pairs (see
    ct_mul_scalar_pt).  Returns [deg+1, l+1, N] (caller rescales once).
    """
    K = stack.shape[0]
    level = stack.shape[2] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((1, 1, -1, 1))
    re_w = consts[:, None, :, 0:1]
    re_sh = consts[:, None, :, 1:2]
    imz_w = consts[:, None, :, 2:3]
    imz_sh = consts[:, None, :, 3:4]
    t_re = rns.shoup_mul(stack, re_w, re_sh, q)
    t_im = rns.shoup_mul(stack, imz_w, imz_sh, q)
    neg = tabs.xhalf_sign_neg[None, None, None, :]
    terms = jnp.where(neg, rns.sub_mod(t_re, t_im, q),
                      rns.add_mod(t_re, t_im, q))
    acc = terms[0]
    q3 = q[0]
    for k in range(1, K):
        acc = rns.add_mod(acc, terms[k], q3)
    return acc


@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.linear_combo_dense")
def ct_linear_combo_dense(params: CKKSParams, tabs: DeviceTables, stack, pts):
    """sum_k stack[k] * dense_pt[k] -- vector-coefficient LUT-sum kernel.

    stack: [K, deg+1, l+1, N]; pts: [K, l+1, N] Montgomery eval.  Returns
    [deg+1, l+1, N] (caller rescales once).  Per-slot coefficient vectors
    make key-dependent LUTs (e.g. AddRoundKey folded into a LUT stage) cost
    the same one level as slot-constant ones.
    """
    K = stack.shape[0]
    level = stack.shape[2] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((1, 1, -1, 1))
    qinv = tr["qinv"].reshape((1, 1, -1, 1))
    terms = rns.mont_mul(stack, pts[:, None], q, qinv)
    acc = terms[0]
    q3 = q[0]
    for k in range(1, K):
        acc = rns.add_mod(acc, terms[k], q3)
    return acc


@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.tensor_sum")
def ct_tensor_sum(params: CKKSParams, tabs: DeviceTables, a_stack, b_stack):
    """sum_k tensor(a[k], b[k]) -> degree-2 data [3, l+1, N].

    a_stack/b_stack: [K, 2, l+1, N].  One fused kernel; the caller does a
    single relinearization of the sum (key-switch hoisting).
    """
    K = a_stack.shape[0]
    level = a_stack.shape[2] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((1, -1, 1))
    qinv = tr["qinv"].reshape((1, -1, 1))
    a0, a1 = a_stack[:, 0], a_stack[:, 1]      # [K, l+1, N]
    b0, b1 = b_stack[:, 0], b_stack[:, 1]
    d0 = rns.mont_mul(a0, b0, q, qinv)
    d1 = rns.add_mod(rns.mont_mul(a0, b1, q, qinv),
                     rns.mont_mul(a1, b0, q, qinv), q)
    d2 = rns.mont_mul(a1, b1, q, qinv)
    qr = tr["q"].reshape((-1, 1))
    acc0, acc1, acc2 = d0[0], d1[0], d2[0]
    for k in range(1, K):
        acc0 = rns.add_mod(acc0, d0[k], qr)
        acc1 = rns.add_mod(acc1, d1[k], qr)
        acc2 = rns.add_mod(acc2, d2[k], qr)
    return jnp.stack([acc0, acc1, acc2])


@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.walsh_subbytes")
def walsh_sub_bytes_core(params: CKKSParams, tabs: DeviceTables,
                         a_stack, b_stack, consts):
    """All 8 Walsh-LUT output planes from two character bases, one program.

    a_stack/b_stack: [U=16, 2, l+1, N] Montgomery eval (the subset-product
    character bases, shared (level, scale)); consts: [8, U, V, l+1, 2]
    (w, w_shoup) pairs of the REAL Walsh weights encoded at the combo
    target scale.  Returns [8, 3, l+1, N] degree-2 PRE-relin sums
    out[k] = sum_u a[u] * (sum_v consts[k,u,v] * b[v]); the caller
    relinearizes and double-rescales each plane.

    Replaces 8 x 16 separate stack+linear_combination dispatches plus 8
    tensor-sum stacks: the b-stack is read once per fused tile instead of
    re-concatenated per call, cutting the round's HBM traffic ~10x
    (measured in the flagship round wall, PERF.md round-4).
    """
    level = a_stack.shape[2] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q1 = tr["q"].reshape((1, 1, -1, 1))           # [.., l+1, N] broadcast
    q2 = tr["q"].reshape((1, -1, 1))
    qinv2 = tr["qinv"].reshape((1, -1, 1))
    # per-u interleave: rhs_u = sum_v consts[:,u,v] * b[v] is consumed by
    # the tensor accumulation in the SAME iteration, so peak liveness is
    # one [8, 2, l+1, N] slice (~0.4 GB at prod_boot work levels) instead
    # of the full [8, U, 2, l+1, N] stage-1 tensor (~3.5 GB -- which OOMed
    # a 16 GB chip next to 11.5 GB of keys)
    d0 = d1 = d2 = None                           # [8, l+1, N] each
    for u in range(a_stack.shape[0]):
        rhs_u = None                              # [8, 2, l+1, N]
        for v in range(b_stack.shape[0]):
            w = consts[:, u, v, None, :, 0:1]     # [8, 1, l+1, 1]
            wsh = consts[:, u, v, None, :, 1:2]
            term = rns.shoup_mul(b_stack[v][None], w, wsh, q1)
            rhs_u = term if rhs_u is None else rns.add_mod(rhs_u, term, q1)
        a0 = a_stack[u, 0][None]                  # [1, l+1, N]
        a1 = a_stack[u, 1][None]
        r0 = rhs_u[:, 0]                          # [8, l+1, N]
        r1 = rhs_u[:, 1]
        t0 = rns.mont_mul(a0, r0, q2, qinv2)
        t1 = rns.add_mod(rns.mont_mul(a0, r1, q2, qinv2),
                         rns.mont_mul(a1, r0, q2, qinv2), q2)
        t2 = rns.mont_mul(a1, r1, q2, qinv2)
        d0 = t0 if d0 is None else rns.add_mod(d0, t0, q2)
        d1 = t1 if d1 is None else rns.add_mod(d1, t1, q2)
        d2 = t2 if d2 is None else rns.add_mod(d2, t2, q2)
    return jnp.stack([d0, d1, d2], axis=1)        # [8, 3, l+1, N]


@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.automorphism")
def ct_automorphism(params: CKKSParams, tabs: DeviceTables, a, perm):
    """Apply Galois automorphism as an eval-domain gather; perm int32 [N]."""
    return a[..., perm]


# ---------------------------------------------------------------------------
# Rescale and level drop
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.rescale")
def ct_rescale(params: CKKSParams, tabs: DeviceTables, a):
    """Drop top prime q_l; out[i] = (a[i] - lift(a[l])) / q_l mod q_i.

    a: [k, l+1, N] -> [k, l, N].  Exact RNS rescale with centered lifting of
    the dropped limb (rounding division).
    """
    k, lp1, n = a.shape
    level = lp1 - 1
    assert level >= 1, "no levels left to rescale"
    ql = int(params.q_primes[level])
    rows_rest = _rows(params, level - 1, False)
    tr_rest = _tabs_rows(tabs, rows_rest)
    tr_last = _tabs_rows(tabs, np.asarray([level], dtype=np.int32))
    # 1) dropped limb -> plain coefficients
    last = a[:, level:level + 1, :]                      # [k,1,N] mont eval
    last_coeff = intt_rows(last, tr_last)
    last_plain = rns.from_mont(last_coeff, tr_last["q"].reshape(1, -1, 1),
                               tr_last["qinv"].reshape(1, -1, 1))  # [k,1,N]
    # 2) centered lift into each remaining modulus
    q_rest = tr_rest["q"].reshape((1, -1, 1))
    magic_rest = tr_rest["magic"].reshape((1, -1, 1))
    ql_u = jnp.uint32(ql)
    half = jnp.uint32((ql + 1) // 2)
    red = rns.barrett_reduce(last_plain, q_rest, magic_rest)  # [k,L',N]
    ql_mod = jnp.asarray(
        np.asarray([ql % int(q) for q in np.asarray(params.q_primes[:level])],
                   dtype=np.uint32)).reshape((1, -1, 1))
    lifted = jnp.where(last_plain >= half,
                       rns.sub_mod(red, ql_mod, q_rest), red)
    # 3) to Montgomery, NTT under each remaining modulus
    lifted_m = rns.to_mont(lifted, q_rest, tr_rest["qinv"].reshape((1, -1, 1)),
                           tr_rest["r2"].reshape((1, -1, 1)))
    lifted_eval = ntt_rows(lifted_m, tr_rest)
    # 4) subtract and multiply by q_l^{-1}
    qlinv = np.asarray(
        [pow(ql, -1, int(q)) for q in params.q_primes[:level]], dtype=np.uint32)
    qlinv_sh = np.asarray(
        [rns.shoup_precompute(int(wv), int(q))
         for wv, q in zip(qlinv, params.q_primes[:level])], dtype=np.uint32)
    diff = rns.sub_mod(a[:, :level, :], lifted_eval, q_rest)
    out = rns.shoup_mul(diff, jnp.asarray(qlinv).reshape((1, -1, 1)),
                        jnp.asarray(qlinv_sh).reshape((1, -1, 1)), q_rest)
    return out


@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.rescale_pair")
def ct_rescale_pair(params: CKKSParams, tabs: DeviceTables, a):
    """Drop the top TWO primes q_l, q_{l-1} in ONE fused kernel.

    a: [k, l+1, N] -> [k, l-1, N].  Garner-combines the two dropped limbs
    into the centered value v mod (q_a*q_b), lifts it into every remaining
    modulus, subtracts, and multiplies by (q_a*q_b)^{-1} -- one rounding
    and one INTT(2 rows)+NTT(l-1 rows) pass instead of two sequential
    ct_rescale programs (two roundings, two NTT passes).  This is the
    rescale the paired-prime hi-precision tier (bootstrap hi_prec, the
    2^52-scale hp profiles) issues on every product; sequential-vs-fused
    parity is asserted by tests/test_engine.py."""
    k, lp1, n = a.shape
    level = lp1 - 1
    assert level >= 2, "need two droppable limbs"
    qa = int(params.q_primes[level])          # dropped first (top)
    qb = int(params.q_primes[level - 1])
    rows_rest = _rows(params, level - 2, False)
    tr_rest = _tabs_rows(tabs, rows_rest)
    tr_pair = _tabs_rows(tabs, np.asarray([level - 1, level], dtype=np.int32))
    # 1) both dropped limbs -> plain coefficients
    pair = a[:, level - 1:level + 1, :]                  # [k,2,N] mont eval
    pair_coeff = intt_rows(pair, tr_pair)
    pair_plain = rns.from_mont(pair_coeff, tr_pair["q"].reshape(1, -1, 1),
                               tr_pair["qinv"].reshape(1, -1, 1))
    v_b = pair_plain[:, 0:1, :]                          # value mod q_b
    v_a = pair_plain[:, 1:2, :]                          # value mod q_a
    # 2) Garner: v = v_a + q_a * t,  t = (v_b - v_a) * q_a^{-1} mod q_b
    qb_u = jnp.uint32(qb)
    magic_b = jnp.uint32(rns.barrett_magic(qb))
    va_red = rns.barrett_reduce(v_a, qb_u, magic_b)
    qa_inv_b = pow(qa % qb, -1, qb)
    t = rns.shoup_mul(rns.sub_mod(v_b, va_red, qb_u),
                      jnp.uint32(qa_inv_b),
                      jnp.uint32(rns.shoup_precompute(qa_inv_b, qb)), qb_u)
    # 3) exact centered test: v >= (q_a*q_b+1)/2  <=>
    #    t > (q_b-1)/2  or  (t == (q_b-1)/2 and v_a >= (q_a+1)/2)
    h = jnp.uint32((qb - 1) // 2)
    high = (t > h) | ((t == h) & (v_a >= jnp.uint32((qa + 1) // 2)))
    # 4) lift into each remaining modulus (minus q_a*q_b when centered-high)
    q_rest = tr_rest["q"].reshape((1, -1, 1))
    magic_rest = tr_rest["magic"].reshape((1, -1, 1))
    rest_primes = [int(q) for q in np.asarray(params.q_primes[:level - 1])]
    qa_mod = np.asarray([qa % q for q in rest_primes], dtype=np.uint32)
    qa_sh = np.asarray([rns.shoup_precompute(int(w), q)
                        for w, q in zip(qa_mod, rest_primes)], dtype=np.uint32)
    qab_mod = np.asarray([(qa * qb) % q for q in rest_primes], dtype=np.uint32)
    t_red = rns.barrett_reduce(t, q_rest, magic_rest)     # [k,L',N]
    va_rest = rns.barrett_reduce(v_a, q_rest, magic_rest)
    lift = rns.add_mod(va_rest,
                       rns.shoup_mul(t_red,
                                     jnp.asarray(qa_mod).reshape((1, -1, 1)),
                                     jnp.asarray(qa_sh).reshape((1, -1, 1)),
                                     q_rest), q_rest)
    lifted = jnp.where(high,
                       rns.sub_mod(lift,
                                   jnp.asarray(qab_mod).reshape((1, -1, 1)),
                                   q_rest), lift)
    # 5) to Montgomery, NTT under each remaining modulus
    lifted_m = rns.to_mont(lifted, q_rest, tr_rest["qinv"].reshape((1, -1, 1)),
                           tr_rest["r2"].reshape((1, -1, 1)))
    lifted_eval = ntt_rows(lifted_m, tr_rest)
    # 6) subtract and divide by q_a*q_b
    qab_inv = np.asarray([pow((qa * qb) % q, -1, q) for q in rest_primes],
                         dtype=np.uint32)
    qab_inv_sh = np.asarray([rns.shoup_precompute(int(w), q)
                             for w, q in zip(qab_inv, rest_primes)],
                            dtype=np.uint32)
    diff = rns.sub_mod(a[:, :level - 1, :], lifted_eval, q_rest)
    return rns.shoup_mul(diff, jnp.asarray(qab_inv).reshape((1, -1, 1)),
                         jnp.asarray(qab_inv_sh).reshape((1, -1, 1)), q_rest)


def ct_drop_to(params: CKKSParams, a, target_level: int):
    """Modulus switch down by simply dropping limbs (scale unchanged)."""
    return a[:, :target_level + 1, :]


@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.mod_raise")
def mod_raise_core(params: CKKSParams, tabs: DeviceTables, a):
    """Bootstrap ModRaise: [k, 1, N] over q0 -> [k, num_q, N] over the full
    chain, by centered-lifting the bottom-prime coefficients into every
    prime (the underlying plaintext becomes m + q0*I)."""
    k = a.shape[0]
    q0 = int(params.q_primes[0])
    tr0 = _tabs_rows(tabs, np.asarray([0], dtype=np.int32))
    top = params.top_level
    tr_all = _tabs_rows(tabs, _rows(params, top, False))
    coeff = intt_rows(a, tr0)
    plain = rns.from_mont(coeff, tr0["q"].reshape(1, -1, 1),
                          tr0["qinv"].reshape(1, -1, 1))      # [k, 1, N]
    half = jnp.uint32((q0 + 1) // 2)
    qv = tr_all["q"].reshape((1, -1, 1))
    red = rns.barrett_reduce(plain, qv, tr_all["magic"].reshape((1, -1, 1)))
    q0_mod = jnp.asarray(np.asarray(
        [q0 % int(q) for q in params.q_primes], dtype=np.uint32)
    ).reshape((1, -1, 1))
    lifted = jnp.where(plain >= half, rns.sub_mod(red, q0_mod, qv), red)
    lifted_m = rns.to_mont(lifted, qv, tr_all["qinv"].reshape((1, -1, 1)),
                           tr_all["r2"].reshape((1, -1, 1)))
    return ntt_rows(lifted_m, tr_all)


# ---------------------------------------------------------------------------
# Hybrid key-switch
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
@jax.named_scope("ckks.ks_decompose")
def ks_decompose(params: CKKSParams, tabs: DeviceTables, c_eval):
    """Digit-decompose + basis-extend + NTT a polynomial for key switching.

    Returns d_eval [dnum_active, M, N] (Montgomery eval over active q +
    specials).  Split out of `keyswitch` so rotation *hoisting* can share one
    decomposition across many Galois applications: automorphisms commute
    with the decomposition limb-wise, so sigma_g(digits) == digits permuted.
    """
    lp1, n = c_eval.shape
    level = lp1 - 1
    kst = params.ks_tables(level)
    basis = kst["basis"]
    rows_q = _rows(params, level, False)
    rows_b = _rows(params, level, True)
    tr_q = _tabs_rows(tabs, rows_q)
    tr_b = _tabs_rows(tabs, rows_b)
    c_coeff = intt_rows(c_eval, tr_q)
    c_plain = rns.from_mont(c_coeff, tr_q["q"].reshape(-1, 1),
                            tr_q["qinv"].reshape(-1, 1))
    q_basis = jnp.asarray(basis).reshape((-1, 1))
    digits_ext = []
    for g in kst["groups"]:
        limbs = g["limbs"]
        cg = c_plain[jnp.asarray(np.asarray(limbs, dtype=np.int32))]
        qg = jnp.asarray(np.asarray([params.q_primes[i] for i in limbs],
                                    dtype=np.uint32)).reshape((-1, 1))
        y = rns.shoup_mul(cg, jnp.asarray(g["inv_w"]).reshape((-1, 1)),
                          jnp.asarray(g["inv_sh"]).reshape((-1, 1)), qg)
        acc = None
        for a_i in range(len(limbs)):
            term = rns.shoup_mul(
                y[a_i][None, :],
                jnp.asarray(g["conv_w"][a_i]).reshape((-1, 1)),
                jnp.asarray(g["conv_sh"][a_i]).reshape((-1, 1)),
                q_basis)
            acc = term if acc is None else rns.add_mod(acc, term, q_basis)
        digits_ext.append(acc)
    dstack = jnp.stack(digits_ext)
    qb = tr_b["q"].reshape((1, -1, 1))
    dm = rns.to_mont(dstack, qb, tr_b["qinv"].reshape((1, -1, 1)),
                     tr_b["r2"].reshape((1, -1, 1)))
    return ntt_rows(dm, tr_b)


def _key_rows(params: CKKSParams, level: int, key_cap):
    """Physical row indices of (q_0..q_level | specials) inside a switch
    key stored with `key_cap` (None = full basis layout).

    Returns concrete numpy (level/key_cap are trace-static), so callers can
    both index with it and recover Python ints for Pallas BlockSpec maps."""
    if key_cap is None:
        return np.asarray(_rows(params, level, True), dtype=np.int32)
    assert level <= key_cap, (
        f"switch key capped at level {key_cap} used at level {level}")
    K = params.num_special
    return np.concatenate([np.arange(level + 1),
                           key_cap + 1 + np.arange(K)]).astype(np.int32)


def _ks_inner(d_eval, key_b, key_a, rows_key, q1d, qinv1d):
    """Digit inner product sum_j d[j]*key[j] over [J, M, N] operands.

    Routes to the hand-tiled Pallas kernel (core/pallas_ks.py) when
    AESFHE_PALLAS_KS=1 and the ring tiles onto (64x128) VREG lanes;
    otherwise the XLA j-loop.  Bit-identical either way (asserted in
    tests/test_native.py); the flag is read at TRACE time, so flipping it
    mid-process does not retrace already-compiled programs.
    """
    J = d_eval.shape[0]           # live digits at this level (<= key dnum)
    assert J <= key_b.shape[0], (d_eval.shape, key_b.shape)
    mode = os.environ.get("AESFHE_PALLAS_KS")
    if (mode in ("1", "rows")
            and d_eval.shape[-1] % (pallas_ks.SUB * pallas_ks.LANES) == 0):
        if mode == "rows":        # DMA key rows via the index map, no copy
            rk = np.asarray(rows_key)
            M = len(rk)
            # two-segment map: rk = [0..lvl, cap+1..cap+K]; recover the
            # boundary and shift directly from the array
            lvl = int(np.max(np.where(rk == np.arange(M), np.arange(M), -1)))
            shift = int(rk[-1] - (M - 1))
            assert np.array_equal(
                rk, np.arange(M) + shift * (np.arange(M) > lvl)), rk
            return pallas_ks.ks_inner_pallas_rows(
                d_eval, key_b, key_a, q1d, qinv1d, lvl, shift)
        kbg = key_b[:J, rows_key]
        kag = key_a[:J, rows_key]
        return pallas_ks.ks_inner_pallas(d_eval, kbg, kag, q1d, qinv1d)
    qb = q1d.reshape((-1, 1))
    qinv_b = qinv1d.reshape((-1, 1))
    acc_b = acc_a = None
    for j in range(d_eval.shape[0]):
        kb = key_b[j][rows_key]
        ka = key_a[j][rows_key]
        tb = rns.mont_mul(d_eval[j], kb, qb, qinv_b)
        ta = rns.mont_mul(d_eval[j], ka, qb, qinv_b)
        acc_b = tb if acc_b is None else rns.add_mod(acc_b, tb, qb)
        acc_a = ta if acc_a is None else rns.add_mod(acc_a, ta, qb)
    return jnp.stack([acc_b, acc_a])


@functools.partial(jax.jit, static_argnums=(0, 5))
@jax.named_scope("ckks.ks_inner_moddown")
def ks_inner_and_moddown(params: CKKSParams, tabs: DeviceTables, d_eval,
                         key_b, key_a, key_cap: int | None = None):
    """Inner product of extended digits with a switch key + P mod-down."""
    M = d_eval.shape[1]
    level = M - 1 - params.num_special
    rows_b = _rows(params, level, True)
    tr_b = _tabs_rows(tabs, rows_b)
    rows_key = _key_rows(params, level, key_cap)
    acc = _ks_inner(d_eval, key_b, key_a, rows_key,
                    tr_b["q"], tr_b["qinv"])
    ba = _mod_down_specials(params, tabs, acc, level)
    return ba[0], ba[1]


@functools.partial(jax.jit, static_argnums=(0, 7))
@jax.named_scope("ckks.hoisted_rotate")
def hoisted_rotate(params: CKKSParams, tabs: DeviceTables, data, d_eval,
                   perm, key_b, key_a, key_cap: int | None = None):
    """Apply one Galois rotation given the SHARED decomposition d_eval of c1.

    sigma_g(c1) decomposes into sigma_g of each digit (the decomposition is
    limb-wise), so one ks_decompose serves every rotation: permute the
    extended digits, inner-product with that rotation's key, mod-down, and
    add the permuted c0.
    """
    p0 = data[0][..., perm]
    d_perm = d_eval[..., perm]
    b, a = ks_inner_and_moddown(params, tabs, d_perm, key_b, key_a, key_cap)
    level = data.shape[1] - 1
    tr = _tabs_rows(tabs, _rows(params, level, False))
    q = tr["q"].reshape((-1, 1))
    return jnp.stack([rns.add_mod(p0, b, q), a])


@functools.partial(jax.jit, static_argnums=(0, 5))
@jax.named_scope("ckks.keyswitch")
def keyswitch(params: CKKSParams, tabs: DeviceTables, c_eval, key_b, key_a,
              key_cap: int | None = None):
    """Switch a single polynomial c (under s') to a pair under s.

    c_eval: [l+1, N] Montgomery eval (the s'-component, e.g. d2 or rotated c1)
    key_b/key_a: [dnum, rows, N] Montgomery eval (full basis, or the
    level-capped layout described by key_cap -- see keys.SwitchKey.cap).
    Returns (b, a): [l+1, N] each, Montgomery eval, scale unchanged.
    """
    lp1, n = c_eval.shape
    level = lp1 - 1
    kst = params.ks_tables(level)
    basis = kst["basis"]                       # numpy uint32 [M]
    M = len(basis)
    K = params.num_special
    rows_q = _rows(params, level, False)
    rows_b = _rows(params, level, True)        # active q + specials
    tr_q = _tabs_rows(tabs, rows_q)
    tr_b = _tabs_rows(tabs, rows_b)

    # 1) c -> plain coefficient domain
    c_coeff = intt_rows(c_eval, tr_q)
    c_plain = rns.from_mont(c_coeff, tr_q["q"].reshape(-1, 1),
                            tr_q["qinv"].reshape(-1, 1))     # [l+1, N]

    # 2) per digit group: scale by inverse-hat, extend to the full basis
    q_basis = jnp.asarray(basis).reshape((-1, 1))            # [M,1]
    digits_ext = []
    for g in kst["groups"]:
        limbs = g["limbs"]
        cg = c_plain[jnp.asarray(np.asarray(limbs, dtype=np.int32))]  # [a,N]
        qg = jnp.asarray(np.asarray([params.q_primes[i] for i in limbs],
                                    dtype=np.uint32)).reshape((-1, 1))
        y = rns.shoup_mul(cg, jnp.asarray(g["inv_w"]).reshape((-1, 1)),
                          jnp.asarray(g["inv_sh"]).reshape((-1, 1)), qg)
        # ext[m] = sum_a y_a * (Qt/q_a mod basis_m)  mod basis_m
        acc = None
        for a_i in range(len(limbs)):
            term = rns.shoup_mul(
                y[a_i][None, :],
                jnp.asarray(g["conv_w"][a_i]).reshape((-1, 1)),
                jnp.asarray(g["conv_sh"][a_i]).reshape((-1, 1)),
                q_basis)                                      # [M, N]
            acc = term if acc is None else rns.add_mod(acc, term, q_basis)
        digits_ext.append(acc)
    dstack = jnp.stack(digits_ext)                            # [d, M, N] plain

    # 3) Montgomery + NTT under every basis modulus (batched over digits)
    qb = tr_b["q"].reshape((1, -1, 1))
    dm = rns.to_mont(dstack, qb, tr_b["qinv"].reshape((1, -1, 1)),
                     tr_b["r2"].reshape((1, -1, 1)))
    d_eval = ntt_rows(dm, tr_b)                               # [d, M, N]

    # 4) inner product with the key (rows: active q + specials)
    rows_key = _key_rows(params, level, key_cap)
    acc = _ks_inner(d_eval, key_b, key_a, rows_key, tr_b["q"], tr_b["qinv"])

    # 5) mod-down by the special primes (b and a batched through one call)
    ba = _mod_down_specials(params, tabs, acc, level)
    return ba[0], ba[1]


def _mod_down_specials(params: CKKSParams, tabs: DeviceTables, x, level: int):
    """x: [..., l+1+K, N] over (active q | specials) -> [..., l+1, N] ~ x / P.

    Fused one-shot mod-down: ONE batched iNTT over the K special rows, an
    approximate CRT base conversion P -> active q on the VPU, and ONE batched
    NTT over the q rows — instead of K sequential full-width NTT round trips.

    The raw conversion sum_i y_i*(P/p_i) equals [x]_P + v*P with a
    data-dependent integer overshoot v in [0, K).  Left uncorrected, v has
    MEAN K/2: a constant per-coefficient bias whose slot evaluation peaks at
    (K/2)*(2N/pi)/Delta — ~1.2e-3 per key-switch at N=2^16/K=8/Delta=2^27,
    which EvalMod's theta_max derivative then amplified into the round-3
    full-ring bootstrap failure (err ~2e4).  The correction estimates
    v_hat = round(sum_i y_i/p_i) in f32 (exact away from half-integer
    boundaries; the 8-term f32 sum error ~1e-7 makes a +-1 slip vanishingly
    rare and zero-mean) and subtracts v_hat*P, leaving a centered residual
    with |error| <= 1 unit and ~zero bias.
    """
    K = params.num_special
    lp1 = level + 1
    mdt = params.md_tables(level)
    lead = x.shape[:-2]
    nl = len(lead)

    def shp(t, rows):
        return jnp.asarray(t).reshape((1,) * nl + (rows, 1))

    sp_rows = np.arange(params.num_q, params.num_q + K, dtype=np.int32)
    tr_s = _tabs_rows(tabs, sp_rows)
    tr_q = _tabs_rows(tabs, _rows(params, level, False))
    qv = shp(tr_q["q"], lp1)

    # 1) special limbs -> plain coefficient domain (one batched iNTT)
    spec = x[..., lp1:, :]                                   # [..., K, N]
    d_coeff = intt_rows(spec, tr_s)
    ps = shp(tr_s["q"], K)
    d_plain = rns.from_mont(d_coeff, ps, shp(tr_s["qinv"], K))

    # 2) y_i = d_i * (P/p_i)^{-1} mod p_i; conv_m = sum_i y_i*(P/p_i) mod q_m
    y = rns.shoup_mul(d_plain, shp(mdt["inv_w"], K), shp(mdt["inv_sh"], K), ps)
    conv = None
    for i in range(K):
        term = rns.shoup_mul(
            y[..., i:i + 1, :],
            shp(mdt["conv_w"][i], lp1), shp(mdt["conv_sh"][i], lp1), qv)
        conv = term if conv is None else rns.add_mod(conv, term, qv)

    # 2b) centered overshoot correction: v_hat = round(sum_i y_i / p_i),
    # conv -= v_hat * (P mod q_m)
    inv_p = jnp.asarray((1.0 / np.asarray(params.special_primes,
                                          dtype=np.float64)).astype(np.float32)
                        ).reshape((1,) * nl + (K, 1))
    frac = jnp.sum(y.astype(jnp.float32) * inv_p, axis=-2, keepdims=True)
    vhat = jnp.round(frac).astype(jnp.uint32)                # [..., 1, N] < K
    corr = rns.shoup_mul(vhat, shp(mdt["pmod_w"], lp1),
                         shp(mdt["pmod_sh"], lp1), qv)
    conv = rns.sub_mod(conv, corr, qv)

    # 3) back to Montgomery eval domain (one batched NTT over the q rows)
    conv_m = rns.to_mont(conv, qv, shp(tr_q["qinv"], lp1),
                         shp(tr_q["r2"], lp1))
    conv_eval = ntt_rows(conv_m, tr_q)

    # 4) (x_q - conv) * P^{-1} mod q
    diff = rns.sub_mod(x[..., :lp1, :], conv_eval, qv)
    return rns.shoup_mul(diff, shp(mdt["pinv_w"], lp1),
                         shp(mdt["pinv_sh"], lp1), qv)


def _mod_down_specials_exact(params: CKKSParams, tabs: DeviceTables, x,
                             level: int):
    """Exact (rounding) mod-down reference: divides by the special primes one
    at a time with centered lifting.  Kept as the ground-truth oracle for
    tests/test_engine.py's mod-down equivalence check; the production path is
    the fused approximate version above.
    """
    K = params.num_special
    lp1 = level + 1
    cur = x[:lp1]                                    # q part [l+1, N]
    spec = [x[lp1 + i:lp1 + i + 1] for i in range(K)]  # each [1, N] eval
    tr_q = _tabs_rows(tabs, _rows(params, level, False))
    qv = tr_q["q"].reshape((-1, 1))
    for si in range(K):
        p = int(params.special_primes[si])
        sp_row = np.asarray([params.num_q + si], dtype=np.int32)
        tr_s = _tabs_rows(tabs, sp_row)
        d_coeff = intt_rows(spec[si], tr_s)          # [1, N]
        d_plain = rns.from_mont(d_coeff, tr_s["q"].reshape(-1, 1),
                                tr_s["qinv"].reshape(-1, 1))    # [1, N]
        half = jnp.uint32((p + 1) // 2)
        neg_branch = d_plain >= half                 # [1, N]
        # --- update the q part: cur = (cur - lift(d)) * p^-1 mod q_i ---
        red = rns.barrett_reduce(d_plain, qv, tr_q["magic"].reshape((-1, 1)))
        p_mod = jnp.asarray(np.asarray(
            [p % int(q) for q in params.q_primes[:lp1]],
            dtype=np.uint32)).reshape((-1, 1))
        lifted = jnp.where(neg_branch, rns.sub_mod(red, p_mod, qv), red)
        lifted_m = rns.to_mont(lifted, qv, tr_q["qinv"].reshape((-1, 1)),
                               tr_q["r2"].reshape((-1, 1)))
        lifted_eval = ntt_rows(lifted_m, tr_q)
        diff = rns.sub_mod(cur, lifted_eval, qv)
        pinv = np.asarray([pow(p, -1, int(q)) for q in params.q_primes[:lp1]],
                          dtype=np.uint32)
        pinv_sh = np.asarray(
            [rns.shoup_precompute(int(wv), int(q))
             for wv, q in zip(pinv, params.q_primes[:lp1])], dtype=np.uint32)
        cur = rns.shoup_mul(diff, jnp.asarray(pinv).reshape((-1, 1)),
                            jnp.asarray(pinv_sh).reshape((-1, 1)), qv)
        # --- update the remaining special limbs the same way ---
        for sj in range(si + 1, K):
            pj = int(params.special_primes[sj])
            qs = jnp.uint32(pj)
            redj = rns.barrett_reduce(d_plain, qs,
                                      jnp.uint32(rns.barrett_magic(pj)))
            liftedj = jnp.where(neg_branch,
                                rns.sub_mod(redj, jnp.uint32(p % pj), qs), redj)
            trj = _tabs_rows(tabs, np.asarray([params.num_q + sj],
                                              dtype=np.int32))
            lm = rns.to_mont(liftedj, qs, trj["qinv"].reshape(-1, 1),
                             trj["r2"].reshape(-1, 1))
            le = ntt_rows(lm, trj)
            dj = rns.sub_mod(spec[sj], le, qs)
            pinvj = pow(p, -1, pj)
            spec[sj] = rns.shoup_mul(
                dj, jnp.uint32(pinvj),
                jnp.uint32(rns.shoup_precompute(pinvj, pj)), qs)
    return cur
