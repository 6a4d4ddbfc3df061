"""Collective hybrid key-switch: digit-parallel shard_map with one psum.

The FHE analogue of tensor-parallel matmul + all-reduce (SURVEY.md section
2.3 item 4): the hybrid key-switch digit decomposition is an independent
per-digit pipeline — basis-extend the digit, NTT it over the extended basis,
inner-product with that digit's key column — followed by a SUM over digits.
Sharding the digit axis over the mesh puts 1/D of the basis-extension NTTs
and key multiplies on each chip, with each chip holding ONLY its own key
digits (the memory win: switch keys are the largest persistent buffers in
CKKS), and reduces the partial products with a single jax.lax.psum over ICI.

The reference's engine is single-device (/root/reference/engine_context.py:38);
there is nothing to compare against — the contract here is bit-equivalence
with the local ops_impl.keyswitch, asserted in tests/test_parallel.py.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import rns, ops_impl
from ..core.ops_impl import (_rows, _tabs_rows, ntt_rows, intt_rows,
                             _mod_down_specials)


def _padded_digit_tables(params, level: int, D: int):
    """Per-digit decomposition tables, padded to a uniform [D_pad, alpha]
    shape (zero weights => zero contribution), as host numpy arrays.

    Returns dict with limb gather indices, inverse-hat Shoup pairs, basis
    conversion Shoup pairs, per-digit limb moduli, and dnum (real digits).
    """
    kst = params.ks_tables(level)
    groups = kst["groups"]
    dnum = len(groups)
    M = len(kst["basis"])
    alpha = max(len(g["limbs"]) for g in groups)
    pad = max(D, dnum)
    idx = np.zeros((pad, alpha), dtype=np.int32)
    q_limb = np.ones((pad, alpha), dtype=np.uint32)   # 1: harmless modulus
    inv_w = np.zeros((pad, alpha), dtype=np.uint32)
    inv_sh = np.zeros((pad, alpha), dtype=np.uint32)
    conv_w = np.zeros((pad, alpha, M), dtype=np.uint32)
    conv_sh = np.zeros((pad, alpha, M), dtype=np.uint32)
    for j, g in enumerate(groups):
        a = len(g["limbs"])
        idx[j, :a] = g["limbs"]
        q_limb[j, :a] = [params.q_primes[i] for i in g["limbs"]]
        inv_w[j, :a] = g["inv_w"]
        inv_sh[j, :a] = g["inv_sh"]
        conv_w[j, :a] = g["conv_w"]
        conv_sh[j, :a] = g["conv_sh"]
    return dict(idx=idx, q_limb=q_limb, inv_w=inv_w, inv_sh=inv_sh,
                conv_w=conv_w, conv_sh=conv_sh, dnum=dnum, M=M,
                basis=np.asarray(kst["basis"], dtype=np.uint32))


class DistKeySwitch:
    """Digit-sharded key-switch over mesh axis `axis`.

    Call with the s'-polynomial c_eval [l+1, N] (replicated) and a SwitchKey;
    returns (b, a) [l+1, N] bit-identical to ops_impl.keyswitch.  Per level a
    jitted shard_map program is built once and cached.
    """

    def __init__(self, params, tabs, mesh: Mesh, axis: str = "limb"):
        self.params = params
        self.tabs = tabs
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.shape[axis]
        self._fns = {}

    # -- per-level program ---------------------------------------------------
    def _build(self, level: int):
        params, tabs, mesh, axis = self.params, self.tabs, self.mesh, self.axis
        D = self.D
        t = _padded_digit_tables(params, level, D)
        per = (t["idx"].shape[0] + D - 1) // D
        pad = per * D

        def padD(x):
            if x.shape[0] == pad:
                return x
            fill = np.zeros((pad - x.shape[0],) + x.shape[1:], x.dtype)
            if x.dtype == np.uint32 and x.ndim == 2 and x is t["q_limb"]:
                fill[:] = 1
            return np.concatenate([x, fill])

        rows_b = _rows(params, level, True)
        tr_b = _tabs_rows(tabs, rows_b)
        q_basis = jnp.asarray(t["basis"]).reshape(1, -1, 1)
        q_host = [int(q) for q in np.asarray(tr_b["q"])]
        sh_w = jnp.asarray([(1 << 16) % q for q in q_host],
                           dtype=jnp.uint32).reshape(1, -1, 1)
        sh_sh = jnp.asarray([rns.shoup_precompute((1 << 16) % q, q)
                             for q in q_host],
                            dtype=jnp.uint32).reshape(1, -1, 1)

        digit_tabs = [jnp.asarray(padD(t[k])) for k in
                      ("idx", "q_limb", "inv_w", "inv_sh", "conv_w",
                       "conv_sh")]
        dspec = P(axis)      # leading digit axis sharded

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(), dspec, dspec, dspec, dspec, dspec,
                                     dspec, dspec, dspec),
                           out_specs=P())
        def _partial_inner(c_plain, idx, q_limb, inv_w, inv_sh, conv_w,
                           conv_sh, kb, ka):
            # idx/.. [per, alpha(, M)]; kb/ka [per, M, N]
            qb = tr_b["q"].reshape((-1, 1))
            acc_b = acc_a = None
            for j in range(idx.shape[0]):
                cg = c_plain[idx[j]]                          # [alpha, N]
                y = rns.shoup_mul(cg, inv_w[j][:, None], inv_sh[j][:, None],
                                  q_limb[j][:, None])
                ext = None
                for a_i in range(y.shape[0]):
                    term = rns.shoup_mul(y[a_i][None, :],
                                         conv_w[j, a_i][:, None],
                                         conv_sh[j, a_i][:, None],
                                         q_basis[0])
                    ext = term if ext is None else rns.add_mod(ext, term,
                                                               q_basis[0])
                dm = rns.to_mont(ext, qb, tr_b["qinv"].reshape((-1, 1)),
                                 tr_b["r2"].reshape((-1, 1)))
                d_eval = ntt_rows(dm, tr_b)                   # [M, N]
                tb = rns.mont_mul(d_eval, kb[j], qb,
                                  tr_b["qinv"].reshape((-1, 1)))
                ta = rns.mont_mul(d_eval, ka[j], qb,
                                  tr_b["qinv"].reshape((-1, 1)))
                acc_b = tb if acc_b is None else rns.add_mod(acc_b, tb, qb)
                acc_a = ta if acc_a is None else rns.add_mod(acc_a, ta, qb)
            # modular all-reduce: psum overflows uint32, so reduce in two
            # uint32-exact halves (each < 2^31) and fold mod q afterwards
            both = jnp.stack([acc_b, acc_a])                  # [2, M, N]
            lo = jax.lax.psum(both & jnp.uint32(0xFFFF), axis)
            hi = jax.lax.psum(both >> 16, axis)
            qv = qb[None]
            magic = tr_b["magic"].reshape((1, -1, 1))
            lo_r = rns.barrett_reduce(lo, qv, magic)
            # hi * 2^16 mod q via Shoup on the reduced hi
            hi_r = rns.barrett_reduce(hi, qv, magic)
            sh_w = jnp.asarray(
                np.asarray([(1 << 16) % int(q) for q in
                            np.asarray(tr_b["q"])], dtype=np.uint32)
            ).reshape(1, -1, 1)
            sh_sh = jnp.asarray(
                np.asarray([rns.shoup_precompute((1 << 16) % int(q), int(q))
                            for q in np.asarray(tr_b["q"])], dtype=np.uint32)
            ).reshape(1, -1, 1)
            return rns.add_mod(lo_r, rns.shoup_mul(hi_r, sh_w, sh_sh, qv), qv)

        tr_q = _tabs_rows(tabs, _rows(params, level, False))

        @jax.jit
        def run(c_eval, kb, ka):
            c_coeff = intt_rows(c_eval, tr_q)
            c_plain = rns.from_mont(c_coeff, tr_q["q"].reshape(-1, 1),
                                    tr_q["qinv"].reshape(-1, 1))
            acc = _partial_inner(c_plain, *digit_tabs, kb, ka)
            ba = _mod_down_specials(params, tabs, acc, level)
            return ba[0], ba[1]

        return run, t["dnum"], pad, rows_b

    def __call__(self, c_eval, key):
        level = c_eval.shape[0] - 1
        if level not in self._fns:
            self._fns[level] = self._build(level)
        run, dnum, pad, rows_b = self._fns[level]
        rows = jnp.asarray(rows_b)
        # only the digits active at this level; pad the rest with zero keys
        kb = key.b[:dnum, rows, :]
        ka = key.a[:dnum, rows, :]
        if dnum < pad:
            z = jnp.zeros((pad - dnum,) + kb.shape[1:], kb.dtype)
            kb = jnp.concatenate([kb, z])
            ka = jnp.concatenate([ka, z])
        return run(c_eval, kb, ka)
