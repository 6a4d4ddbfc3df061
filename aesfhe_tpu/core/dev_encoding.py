"""Device-side CKKS encode/decode: the canonical embedding as jitted XLA.

The host path (core/encoding.py: numpy complex128 FFT + Garner CRT) is exact
but serializes every encrypt/decrypt on the host — at N=2^16 the bit-sliced
pipeline pays 8 host FFTs per encrypt_state/decrypt_state call (the reference
never sees this cost: desilofhe's native encode is inside its engine,
/root/reference/xor_service.py:65-66).  This module keeps the whole
transform on the device:

  encode:  slots --(gather)--> natural eval order --c64 FFT--> psi^-k twist
           --round to int32--> per-prime residues --Montgomery+NTT--> eval

  decode:  limb residues --exact 2-limb Garner (uint32 Shoup)--> centered
           f32 coefficients --c64 IFFT + psi^k twist--> (gather) slots

Precision: the FFT runs in complex64, so encoded coefficients carry a
relative error ~1e-6 of the scale (measured 3e-3 absolute at Delta=2^27,
i.e. ~2^-35 of q0q1) on top of CKKS's inherent 0.5 rounding noise —
orders of magnitude below every decode margin in the AES pipelines
(zeta16 phase margin 0.098, bit-plane sign margin 1.0, cleanse convergence
threshold ~0.03).  The two-limb Garner step itself is EXACT uint32
arithmetic; only the final float reconstruction rounds, and only after the
value is already centered and small (|coeff| << q0*q1/2 — asserted range
q0*q1 ~ 2^60 vs coefficients ~ 2^30).  Host encode remains the default for
plaintext constants that feed deep circuits (bootstrap diagonals, cached
service weights) where full f64 precision is free because they encode once.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import rns, ops_impl
from .params import CKKSParams


@functools.lru_cache(maxsize=None)
def _embed_maps(params: CKKSParams):
    """Host-precomputed gather maps between slot order and the natural
    (exponent 2j+1) evaluation order used by the FFT."""
    n = params.n
    pos = params.pos_of_exp[1::2]              # natural j -> output position
    # invert val[slot_pos[k]] = z[k]; val[conj_slot_pos[k]] = conj(z[k])
    src = np.zeros(n, dtype=np.int32)
    conj = np.zeros(n, dtype=bool)
    inv_slot = {int(p): k for k, p in enumerate(params.slot_pos)}
    inv_conj = {int(p): k for k, p in enumerate(params.conj_slot_pos)}
    for j in range(n):
        p = int(pos[j])
        if p in inv_slot:
            src[j] = inv_slot[p]
        else:
            src[j] = inv_conj[p]
            conj[j] = True
    # decode direction: z[k] = natural[j] with pos_of_exp[2j+1] == slot_pos[k]
    j_of_pos = {int(p): j for j, p in enumerate(pos)}
    slot_from_nat = np.asarray([j_of_pos[int(p)] for p in params.slot_pos],
                               dtype=np.int32)
    tw_inv = (params.psi_c_pow_inv / n).astype(np.complex64)
    tw_fwd = params.psi_c_pow.astype(np.complex64)
    return src, conj, slot_from_nat, tw_inv, tw_fwd


@functools.partial(jax.jit, static_argnums=(0, 4))
def _encode_eval_dev(params, tabs, z_re, z_im, level, scale):
    """Complex slots (as separate f32 re/im [slot_count] — the axon TPU
    relay cannot transfer complex arrays) -> eval-domain Montgomery
    [L, N] u32."""
    src, conjf, _, tw_inv, _ = _embed_maps(params)
    z = jax.lax.complex(z_re, z_im)
    natural = z[src]
    natural = jnp.where(jnp.asarray(conjf), jnp.conj(natural), natural)
    p = jnp.fft.fft(natural) * jnp.asarray(tw_inv)
    # exact to f32 precision while |coeff| < 2^24; the host wrapper rejects
    # anything that could reach the int32 wrap at 2^31
    c = jnp.round(jnp.real(p) * scale).astype(jnp.int32)
    qv = jnp.asarray([int(q) for q in params.active_primes(level)],
                     dtype=jnp.int32)[:, None]
    res = jnp.mod(c[None, :], qv).astype(jnp.uint32)          # >= 0 (q > 0)
    rows = ops_impl._rows(params, level, False)
    tr = ops_impl._tabs_rows(tabs, rows)
    q = tr["q"].reshape((-1, 1))
    xm = rns.to_mont(res, q, tr["qinv"].reshape((-1, 1)),
                     tr["r2"].reshape((-1, 1)))
    return ops_impl.ntt_rows(xm, tr)


def encode_eval_dev(params, tabs, vec, level: int, scale: float):
    """Host-facing wrapper: pad/validate, upload once, run the jitted core."""
    sc = params.slot_count
    z = np.asarray(vec)
    if z.size < sc:
        z = np.pad(z, (0, sc - z.size))
    elif z.size > sc:
        raise ValueError(f"too many slots: {z.size} > {sc}")
    z = np.asarray(z, dtype=np.complex128)
    # coefficient magnitude is bounded by max|slot| * scale (unitary-up-to-
    # scaling embedding); beyond int32 the rounded f32 coefficients would
    # wrap silently into corrupt residues
    peak = float(np.max(np.abs(z))) * scale if z.size else 0.0
    if peak >= 2 ** 31:
        raise ValueError(
            f"encode overflow: max|slot| * scale = {peak:.3g} >= 2^31; "
            "reduce the input magnitude or the scale, or use the host "
            "encode path")
    return _encode_eval_dev(params, tabs,
                            jnp.asarray(z.real, dtype=jnp.float32),
                            jnp.asarray(z.imag, dtype=jnp.float32),
                            level, float(scale))


@functools.partial(jax.jit, static_argnums=0)
def _decode_slots_dev(params, residues, scale):
    """Coefficient residues [L, N] u32 (standard domain) -> slots c64.

    L >= 2: exact two-limb Garner lift, centered before any float touches
    the value.  L == 1: single-limb centering (needs |coeff| < q0/2).
    """
    _, _, slot_from_nat, _, tw_fwd = _embed_maps(params)
    q0 = int(params.q_primes[0])
    r0 = residues[0]
    if residues.shape[0] >= 2:
        q1 = int(params.q_primes[1])
        inv01 = pow(q0, -1, q1)
        inv01_sh = rns.shoup_precompute(inv01, q1)
        # q1 (a scale prime, ~2^scale_bits) can be much smaller than the
        # first prime q0, so a full Barrett reduction is required here
        r0m = rns.barrett_reduce(r0, jnp.uint32(q1),
                                 jnp.uint32(rns.barrett_magic(q1)))
        d = rns.sub_mod(residues[1], r0m, jnp.uint32(q1))
        t = rns.shoup_mul(d, jnp.uint32(inv01), jnp.uint32(inv01_sh),
                          jnp.uint32(q1))
        t_c = jnp.where(t > q1 // 2, t.astype(jnp.int32) - q1,
                        t.astype(jnp.int32)).astype(jnp.float32)
        v = r0.astype(jnp.float32) + np.float32(q0) * t_c
    else:
        v = jnp.where(r0 > q0 // 2, r0.astype(jnp.int32) - q0,
                      r0.astype(jnp.int32)).astype(jnp.float32)
    p = (v / scale).astype(jnp.complex64) * jnp.asarray(tw_fwd)
    natural = jnp.fft.ifft(p) * params.n
    z = natural[slot_from_nat]
    # f32 re/im pair: the axon relay cannot transfer complex arrays
    return jnp.stack([jnp.real(z), jnp.imag(z)])
