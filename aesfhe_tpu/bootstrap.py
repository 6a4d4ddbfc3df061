"""CKKS bootstrapping: ModRaise -> CoeffToSlot -> EvalMod -> SlotToCoeff.

Replaces desilofhe's engine.bootstrap (/root/reference/xor_service.py:120-129,
engine_context.py:70-73).  The reference leans on bootstrap freely (4 per
merged shift-mix, level<8 checks inside every XOR); this implements it from
scratch:

  ModRaise     reinterpret the bottom-prime residues as integers over the
               full chain: decrypts to m + q0*I with |I| <~ hamming/2
               (sparse secret; params.secret_hamming)
  CoeffToSlot  homomorphic inverse-embedding: two ciphertexts whose slots
               hold the polynomial coefficients, via BSGS diagonal
               matrix-vector products (closed-form diagonals, no dense
               matrix materialization) + a conjugation for 2*Re
  EvalMod      x -> (q0/Delta)*sin(2*pi*x*Delta/q0)/(2*pi) approximated by a
               Chebyshev expansion of cos at reduced range + r double-angle
               squarings (sin(t) = cos(t - pi/2))
  SlotToCoeff  forward embedding back to coefficient placement

Current scope: single-prime-rescale profiles (scale <= 2^29) and dense-BSGS
linear transforms, practical for N <= 2^13 (the factored FFT-style transform
for N=2^16 is the planned follow-up; SURVEY.md section 7 ranks bootstrap the
#1 hard part).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List

import numpy as np
import jax.numpy as jnp

from .core.ciphertext import Ciphertext
from .core import rns, ops_impl
from .core.keys import GaloisKeySet, gen_rotation_keys


@dataclass
class BootstrapKey:
    small: bool
    rot: GaloisKeySet | None = None
    baby: int = 0
    giant: int = 0
    K: float = 0.0            # EvalMod input range |t| <= K
    cheb_deg: int = 31
    double_angles: int = 2    # each doubling amplifies noise ~4x, keep low


def _bsgs_split(n_slots: int) -> tuple[int, int]:
    b = 1
    while b * b < n_slots:
        b *= 2
    return b, n_slots // b


def create_bootstrap_key(engine, sk, small: bool = False) -> BootstrapKey:
    params = engine.params
    if params.rescale_primes != 1:
        # byte-domain hp profiles bootstrap via the nibble pipeline instead
        raise NotImplementedError(
            "bootstrap currently targets single-prime-rescale profiles")
    sc = params.slot_count
    baby, giant = _bsgs_split(sc)
    steps = set(range(1, baby))
    steps |= {g * baby for g in range(1, giant)}
    rot = gen_rotation_keys(params, engine.tabs, sk, sorted(steps))
    h = params.secret_hamming or params.n // 2
    # |I| concentrates around sqrt(h)/2; 1.5*sqrt(h)+4 leaves ~5+ sigma
    K = 1.5 * np.sqrt(h) + 4
    # Noise through the double-angle chain grows ~4^r, so keep r small and
    # pay with Chebyshev degree instead ("small" trades accuracy for cost).
    da = 3 if small else 2
    theta_max = (2 * np.pi * K + np.pi / 2) / (2 ** da)
    deg = int(1.3 * theta_max) + 24
    return BootstrapKey(small=small, rot=rot, baby=baby, giant=giant, K=K,
                        cheb_deg=deg, double_angles=da)


# ---------------------------------------------------------------------------
# ModRaise
# ---------------------------------------------------------------------------

def _mod_raise(engine, ct: Ciphertext) -> Ciphertext:
    """Bottom-prime ciphertext -> full-level ciphertext of m + q0*I."""
    params = engine.params
    tabs = engine.tabs
    data0 = ops_impl.ct_drop_to(params, ct.data, 0)     # [k, 1, N]
    raised = ops_impl.mod_raise_core(params, tabs, data0)
    return Ciphertext(raised, ct.scale)


# ---------------------------------------------------------------------------
# Homomorphic linear transforms (dense BSGS over closed-form diagonals)
# ---------------------------------------------------------------------------

class _DiagCache:
    """Per-(map, level) encoded diagonal plaintexts."""

    def __init__(self):
        self.store: Dict[Any, Any] = {}


_diag_cache = _DiagCache()


def _apply_linear_map(engine, ct: Ciphertext, diag_fn, tag: str,
                      bk: BootstrapKey) -> Ciphertext:
    """out_slots = M @ in_slots with diag_fn(d) -> complex [sc] diagonal
    diag_d[k] = M[k, (k-d) mod sc]; BSGS: out = sum_g rot(sum_b pt*rot(ct,b), gB).
    """
    params = engine.params
    sc = params.slot_count
    B, G = bk.baby, bk.giant
    # hoisted baby rotations: one shared digit decomposition for all B steps
    babies = engine.hoisted_rotations(ct, bk.rot, list(range(B)))
    out = None
    for g in range(G):
        acc = None
        for b in range(B):
            d = g * B + b
            key = (tag, d, babies[b].level)
            pt = _diag_cache.store.get(key)
            if pt is None:
                diag = diag_fn(d)
                # pre-rotate for the outer rotation: diag'_{g,b} = roll(diag, -gB)
                pt = engine.encode(np.roll(diag, -g * B),
                                   level=babies[b].level)
                _diag_cache.store[key] = pt
            term = engine.multiply_plain(babies[b], pt)
            acc = term if acc is None else engine.add(acc, term)
        if g:
            acc = engine.rotate(acc, bk.rot, g * B)
        out = acc if out is None else engine.add(out, acc)
    return out


def _cts_diag(params, half: int):
    """CoeffToSlot diagonals: F[k, j] = psi_C^(-e_j * (k + offset)) / N,
    out_k = 2*Re((F z)_k) -> handled by caller with conj; the 2/N is folded
    here as 1/N (2Re = x + conj(x))."""
    sc = params.slot_count
    n = params.n
    two_n = 2 * n
    e = params.slot_exp                     # [sc]

    def diag_fn_factory(offset):
        def diag_fn(d):
            k = np.arange(sc)
            j = (k - d) % sc
            expnt = (-(e[j] * (k + offset))) % two_n
            return np.exp(1j * np.pi * expnt / n) / n
        return diag_fn

    return diag_fn_factory(0), diag_fn_factory(half)


def _stc_diag(params, half: int):
    """SlotToCoeff diagonals: E[j, k] = psi_C^(e_j * (k + offset))."""
    sc = params.slot_count
    n = params.n
    two_n = 2 * n
    e = params.slot_exp

    def diag_fn_factory(offset):
        def diag_fn(d):
            j = np.arange(sc)
            k = (j - d) % sc
            expnt = (e[j] * (k + offset)) % two_n
            return np.exp(1j * np.pi * expnt / n)
        return diag_fn

    return diag_fn_factory(0), diag_fn_factory(half)


# ---------------------------------------------------------------------------
# EvalMod: Chebyshev cos + double angles
# ---------------------------------------------------------------------------

def _chebyshev_coeffs(f, deg: int) -> np.ndarray:
    import numpy.polynomial.chebyshev as C
    k = np.arange(deg + 1)
    nodes = np.cos(np.pi * (k + 0.5) / (deg + 1))
    vals = f(nodes)
    coeffs = np.zeros(deg + 1)
    for m in range(deg + 1):
        coeffs[m] = 2.0 / (deg + 1) * np.sum(vals * np.cos(np.pi * m *
                                                           (k + 0.5) /
                                                           (deg + 1)))
    coeffs[0] /= 2
    return coeffs


def _cheb_basis(engine, u: Ciphertext, deg: int, rlk) -> List[Ciphertext]:
    """[T_1(u), ..., T_deg(u)] with binary-depth products:
    T_{2k} = 2 T_k^2 - 1; T_{2k+1} = 2 T_k T_{k+1} - T_1."""
    T: Dict[int, Ciphertext] = {1: u}
    for m in range(2, deg + 1):
        if m % 2 == 0:
            k = m // 2
            t = engine.multiply(T[k], T[k], rlk)
            t = engine.add(t, t)
            T[m] = engine.add_plain(t, -1.0)
        else:
            k = m // 2
            t = engine.multiply(T[k], T[k + 1], rlk)
            t = engine.add(t, t)
            T[m] = engine.sub(t, T[1])
    return [T[m] for m in range(1, deg + 1)]


def eval_mod_scales(bk: BootstrapKey, q0: int, delta: float):
    """(a_scale, b_shift): u = x*a_scale + b_shift maps x = (m+q0*I)/Delta
    onto the normalized Chebyshev domain u = (2 pi t - pi/2)/(2^r theta_max),
    t = x*Delta/q0.  a_scale is applied BEFORE CoeffToSlot so the linear
    transform works on O(1) values (keeps the CKKS noise floor relative to
    the small scale from being amplified by the q0*I magnitude)."""
    r = bk.double_angles
    theta_max = (2 * np.pi * bk.K + np.pi / 2) / (2 ** r)
    a_scale = (2 * np.pi * delta / q0) / (2 ** r) / theta_max
    b_shift = (-np.pi / 2) / (2 ** r) / theta_max
    return a_scale, b_shift, theta_max


def _eval_mod(engine, u_raw: Ciphertext, bk: BootstrapKey, rlk,
              q0: int, delta: float) -> Ciphertext:
    """input slots u_raw = x*a_scale (pre-scaled coefficients); returns
    slots ~ m/Delta via Chebyshev cos + double angles + arcsine cubic."""
    params = engine.params
    K = bk.K
    r = bk.double_angles
    _, b_shift, theta_max = eval_mod_scales(bk, q0, delta)
    u = engine.add_plain(u_raw, b_shift)
    coeffs = _chebyshev_coeffs(lambda v: np.cos(theta_max * v), bk.cheb_deg)
    basis = _cheb_basis(engine, u, bk.cheb_deg, rlk)
    ks = [m for m in range(1, bk.cheb_deg + 1) if abs(coeffs[m]) > 1e-14]
    y = engine.linear_combination([basis[m - 1] for m in ks],
                                  [coeffs[m] for m in ks],
                                  constant=coeffs[0])
    for _ in range(r):
        y2 = engine.multiply(y, y, rlk)
        y2 = engine.add(y2, y2)
        y = engine.add_plain(y2, -1.0)        # cos(2t) = 2cos^2 - 1
    # y = sin(2 pi m / q0); message ~ arcsin(y) * q0/(2 pi Delta):
    # cubic arcsine correction y + y^3/6 removes the (2 pi m/q0)^3/6 bias
    y2 = engine.multiply(y, y, rlk)
    y3 = engine.multiply(y2, y, rlk)
    corr = engine.add(y, engine.multiply(y3, 1.0 / 6.0))
    return engine.multiply(corr, q0 / (2 * np.pi * delta))


# ---------------------------------------------------------------------------
# Full bootstrap
# ---------------------------------------------------------------------------

def bootstrap(engine, ct: Ciphertext, relin_key, conj_key,
              bootstrap_key: BootstrapKey) -> Ciphertext:
    if bootstrap_key is None or bootstrap_key.rot is None:
        raise NotImplementedError(
            "bootstrap keys missing: create them with "
            "engine.create_bootstrap_key(sk) on a bootstrappable profile "
            "(single-prime rescale, sparse secret)")
    params = engine.params
    engine._count("bootstrap")
    q0 = int(params.q_primes[0])
    sc = params.slot_count
    half = sc

    raised = _mod_raise(engine, ct)
    # pre-normalize so CoeffToSlot operates on O(1) values (see eval_mod_scales)
    a_scale, _, _ = eval_mod_scales(bootstrap_key, q0, ct.scale)
    raised = engine.multiply(raised, a_scale)
    # CoeffToSlot: two maps, then 2*Re via conjugation
    f_a, f_b = _cts_diag(params, half)
    w_a = _apply_linear_map(engine, raised, f_a, "cts_a", bootstrap_key)
    w_b = _apply_linear_map(engine, raised, f_b, "cts_b", bootstrap_key)
    ct_a = engine.add(w_a, engine.conjugate(w_a, conj_key))
    ct_b = engine.add(w_b, engine.conjugate(w_b, conj_key))
    # EvalMod on both coefficient halves
    m_a = _eval_mod(engine, ct_a, bootstrap_key, relin_key, q0, ct.scale)
    m_b = _eval_mod(engine, ct_b, bootstrap_key, relin_key, q0, ct.scale)
    # SlotToCoeff
    e_a, e_b = _stc_diag(params, half)
    out = engine.add(
        _apply_linear_map(engine, m_a, e_a, "stc_a", bootstrap_key),
        _apply_linear_map(engine, m_b, e_b, "stc_b", bootstrap_key))
    return out
