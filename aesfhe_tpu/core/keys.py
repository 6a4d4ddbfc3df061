"""Key generation: secret, public, relinearization, Galois (rotation /
conjugation) keys for the hybrid RNS key-switch.

Mirrors the key family of the reference's EngineContext
(/root/reference/engine_context.py:62-73): secret, public, relinearization,
conjugation, rotation (power-of-two ladder for arbitrary steps), and fixed
rotation keys.  Bootstrap keys are created by aesfhe_tpu.bootstrap.

Randomness: numpy PCG64 by default (research-grade parity with the
reference's unspecified RNG).  For production keygen call
`use_os_entropy()` (or set AESFHE_KEYGEN_RNG=os before import): every draw
is then generated from a PCG64 stream freshly keyed from the kernel CSPRNG
via `secrets` AND re-keyed per sampling call, so no long-lived deterministic
stream state exists to leak or roll back.
"""
from __future__ import annotations

import os as _os
import secrets as _secrets

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax.numpy as jnp

from . import rns, ntt, ops_impl
from .params import CKKSParams


class _OSEntropyRNG:
    """numpy Generator facade re-keyed from os.urandom on every call.

    Each sampling method draws through a PCG64 seeded with 256 fresh bits
    of kernel entropy, so consecutive keys share no PRG state; the PCG64
    expansion only whitens within one call's output block."""

    def _g(self):
        return np.random.default_rng(_secrets.randbits(256))

    def choice(self, *a, **k):
        return self._g().choice(*a, **k)

    def random(self, *a, **k):
        return self._g().random(*a, **k)

    def normal(self, *a, **k):
        return self._g().normal(*a, **k)

    def integers(self, *a, **k):
        return self._g().integers(*a, **k)


_rng = (_OSEntropyRNG() if _os.environ.get("AESFHE_KEYGEN_RNG") == "os"
        else np.random.default_rng())


def seed_keygen(seed: int):
    """Pin keygen to a deterministic PCG64 stream (tests, reproducibility)."""
    global _rng
    _rng = np.random.default_rng(seed)


def use_os_entropy():
    """Switch keygen sampling to OS-entropy-backed draws (production)."""
    global _rng
    _rng = _OSEntropyRNG()


@dataclass
class SecretKey:
    s_eval: Any          # uint32 [L_tot, N] Montgomery eval (all primes)
    s_coeff: np.ndarray  # int8 [N] ternary, host (for debugging/bootstrap)


@dataclass
class PublicKey:
    b: Any               # [num_q, N]
    a: Any


@dataclass
class SwitchKey:
    """Key switching s' -> s: per digit group (b_j, a_j) over the basis.

    cap=None: rows cover the full basis [dnum, L_tot, N].  cap=l: rows
    cover only q_0..q_l plus the specials ([dnum_l, l+1+K, N]) — a key
    that can serve switches at levels <= l for ~(l+1+K)/L_tot of the HBM.
    At prod_boot a full key is 231 MB; the bit-sliced round's rotations
    never run above level ~19, so its direct keys fit in 95 MB each."""
    b: Any               # [dnum(_cap), rows, N]
    a: Any
    cap: int | None = None


@dataclass
class GaloisKeySet:
    keys: dict           # galois element -> SwitchKey


def _sample_ternary(n: int, hamming: int | None = None) -> np.ndarray:
    if hamming is not None:
        s = np.zeros(n, dtype=np.int64)
        idx = _rng.choice(n, hamming, replace=False)
        s[idx] = _rng.choice(np.array([-1, 1]), hamming)
        return s
    u = _rng.random(n)
    return np.where(u < 0.25, -1, np.where(u < 0.5, 1, 0)).astype(np.int64)


def _sample_gauss(n: int, std: float) -> np.ndarray:
    return np.round(_rng.normal(0.0, std, n)).astype(np.int64)


def _sample_uniform_rns(primes, shape) -> np.ndarray:
    """Independent uniform residues per prime == uniform mod prod (CRT)."""
    out = np.zeros((len(primes),) + shape, dtype=np.uint32)
    for i, q in enumerate(primes):
        out[i] = _rng.integers(0, q, shape, dtype=np.uint32)
    return out


def _int_to_rns(v: np.ndarray, primes) -> np.ndarray:
    """Signed int64 [.., N] -> uint32 residues [L, ..]."""
    out = np.zeros((len(primes),) + v.shape, dtype=np.uint32)
    for i, q in enumerate(primes):
        out[i] = np.mod(v, np.int64(q)).astype(np.uint32)
    return out


def _to_eval(params: CKKSParams, tabs, residues_u32, rows) -> Any:
    """Plain coeff residues [L, N] (numpy) -> Montgomery eval (device).

    Prefers the native C++ host kernels (aesfhe_tpu/native): keygen calls
    this dozens of times with varying row counts, and each distinct shape
    would otherwise cost a fresh XLA compile of the NTT graph."""
    from .. import native
    nat = native.to_eval_batch(residues_u32,
                               params.q_arr[rows], params.qinv_arr[rows],
                               params.r2_arr[rows],
                               params.tables.w[rows],
                               params.tables.w_sh[rows])
    if nat is not None:
        return jnp.asarray(nat)
    tr = ops_impl._tabs_rows(tabs, rows)
    x = jnp.asarray(residues_u32)
    q = tr["q"].reshape((-1, 1))
    xm = rns.to_mont(x, q, tr["qinv"].reshape((-1, 1)),
                     tr["r2"].reshape((-1, 1)))
    return ops_impl.ntt_rows(xm, tr)


def gen_secret_key(params: CKKSParams, tabs) -> SecretKey:
    s = _sample_ternary(params.n, params.secret_hamming)
    res = _int_to_rns(s, params.all_primes)
    rows = np.arange(params.L_tot, dtype=np.int32)
    return SecretKey(_to_eval(params, tabs, res, rows), s.astype(np.int8))


def gen_public_key(params: CKKSParams, tabs, sk: SecretKey) -> PublicKey:
    primes = params.q_primes
    rows = np.arange(params.num_q, dtype=np.int32)
    a_res = _sample_uniform_rns(primes, (params.n,))
    e_res = _int_to_rns(_sample_gauss(params.n, params.error_std), primes)
    a_eval = _to_eval(params, tabs, a_res, rows)
    e_eval = _to_eval(params, tabs, e_res, rows)
    tr = ops_impl._tabs_rows(tabs, rows)
    q = tr["q"].reshape((-1, 1))
    s_q = sk.s_eval[:params.num_q]
    b = rns.add_mod(
        rns.neg_mod(rns.mont_mul(a_eval, s_q, q, tr["qinv"].reshape((-1, 1))),
                    q),
        e_eval, q)
    return PublicKey(b=b, a=a_eval)


def gen_switch_key(params: CKKSParams, tabs, sk: SecretKey,
                   s_prime_eval, lvl_cap: int | None = None) -> SwitchKey:
    """ksk_j = (-a_j s + e_j + P * g_j * s', a_j) over QP.

    The per-group gadget P*g_j is, in RNS, simply (P mod q_i) on the group's
    own primes and 0 elsewhere (including the special primes) -- see
    SURVEY.md section 2.1 / the hybrid key-switch notes in ops_impl.keyswitch.

    `lvl_cap` generates a level-capped key: rows q_0..q_cap + specials and
    only the digit groups active at that level (see SwitchKey.cap).
    """
    n = params.n
    if lvl_cap is None:
        rows = np.arange(params.L_tot, dtype=np.int32)
        groups = params.groups
    else:
        rows = np.asarray(
            list(range(lvl_cap + 1)) +
            list(range(params.num_q, params.num_q + params.num_special)),
            dtype=np.int32)
        groups = [[i for i in grp if i <= lvl_cap] for grp in params.groups]
        groups = [g for g in groups if g]
    basis_primes = tuple(params.all_primes[r] for r in rows)
    tr = ops_impl._tabs_rows(tabs, rows)
    q = tr["q"].reshape((-1, 1))
    qinv = tr["qinv"].reshape((-1, 1))
    rows_j = jnp.asarray(rows)
    s_rows = sk.s_eval[rows_j]
    sp_rows = s_prime_eval[rows_j] if lvl_cap is not None else s_prime_eval
    P = 1
    for p in params.special_primes:
        P *= p
    b_list, a_list = [], []
    for grp in groups:
        a_res = _sample_uniform_rns(basis_primes, (n,))
        e_res = _int_to_rns(_sample_gauss(n, params.error_std), basis_primes)
        a_eval = _to_eval(params, tabs, a_res, rows)
        e_eval = _to_eval(params, tabs, e_res, rows)
        b = rns.add_mod(
            rns.neg_mod(rns.mont_mul(a_eval, s_rows, q, qinv), q),
            e_eval, q)
        # + P*g_j*s' on the group's own prime rows (q-row i sits at
        # physical row i in both layouts since i <= lvl_cap)
        pg = np.zeros((len(rows), 1), dtype=np.uint32)
        pg_sh = np.zeros((len(rows), 1), dtype=np.uint32)
        for i in grp:
            qi = params.q_primes[i]
            w = P % qi
            pg[i, 0] = w
            pg_sh[i, 0] = rns.shoup_precompute(w, qi)
        term = rns.shoup_mul(sp_rows, jnp.asarray(pg), jnp.asarray(pg_sh),
                             q)
        b = rns.add_mod(b, term, q)
        b_list.append(b)
        a_list.append(a_eval)
    return SwitchKey(b=jnp.stack(b_list), a=jnp.stack(a_list), cap=lvl_cap)


def gen_relin_key(params: CKKSParams, tabs, sk: SecretKey) -> SwitchKey:
    rows = np.arange(params.L_tot, dtype=np.int32)
    tr = ops_impl._tabs_rows(tabs, rows)
    q = tr["q"].reshape((-1, 1))
    s2 = rns.mont_mul(sk.s_eval, sk.s_eval, q, tr["qinv"].reshape((-1, 1)))
    return gen_switch_key(params, tabs, sk, s2)


def gen_galois_key(params: CKKSParams, tabs, sk: SecretKey,
                   galois_elt: int, lvl_cap: int | None = None) -> SwitchKey:
    perm = jnp.asarray(params.galois_perm(galois_elt))
    s_g = sk.s_eval[..., perm]
    return gen_switch_key(params, tabs, sk, s_g, lvl_cap=lvl_cap)


def gen_rotation_keys(params: CKKSParams, tabs, sk: SecretKey,
                      steps: list[int] | None = None,
                      lvl_cap: int | None = None) -> GaloisKeySet:
    """Power-of-two ladder (both signs) for arbitrary-step rotation, plus any
    explicitly requested steps (create_fixed_rotation_key parity,
    /root/reference/engine_context.py:68-69)."""
    sc = params.slot_count
    wanted: set[int] = set()
    if steps is None:
        p2 = 1
        while p2 < sc:
            wanted.add(p2)
            wanted.add(sc - p2)   # == -p2 mod sc
            p2 *= 2
    else:
        for s in steps:
            wanted.add(s % sc)
    wanted.discard(0)
    keys = {}
    for s in sorted(wanted):
        g = params.rot_galois_elt(s)
        if g not in keys:
            keys[g] = gen_galois_key(params, tabs, sk, g, lvl_cap=lvl_cap)
    return GaloisKeySet(keys=keys)
