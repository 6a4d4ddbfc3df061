"""Collective hybrid key-switch: digit-parallel shard_map with one psum.

The FHE analogue of tensor-parallel matmul + all-reduce (SURVEY.md section
2.3 item 4): the hybrid key-switch digit decomposition is an independent
per-digit pipeline — basis-extend the digit, NTT it over the extended basis,
inner-product with that digit's key column — followed by a SUM over digits.
Sharding the digit axis over the mesh puts 1/D of the basis-extension NTTs
and key multiplies on each chip, with each chip holding ONLY its own key
digits (the memory win: switch keys are the largest persistent buffers in
CKKS), and reduces the partial products with a single jax.lax.psum over ICI.

Beyond the one-shot `keyswitch`, this class exposes the full key-switch
surface the Engine needs (see core/engine.py "key-switch routing hooks"):

  relin(data, key)                degree-2 relinearization
  galois(data, perm, key)         automorphism + switch-back
  decompose(c1)                   DIGIT-SHARDED shared decomposition
  hoisted_apply(data, d, perm, k) one rotation from a shared decomposition

so parallel.mesh_engine.MeshEngine can route *every* multiply / rotate /
conjugate / hoisted-rotation batch of an arbitrary circuit through the
collective path.  The hoisted pair mirrors ops_impl.ks_decompose /
hoisted_rotate: automorphisms commute with the decomposition limb-wise, so
the sharded digits are permuted locally (a gather on the unsharded N axis)
and only the final partial-product reduction crosses chips.

The reference's engine is single-device (/root/reference/engine_context.py:38);
there is nothing to compare against — the contract here is bit-equivalence
with the local ops_impl paths (modular adds are exact, so any accumulation
grouping gives identical limbs), asserted in tests/test_parallel.py.
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


def _padded_digit_tables(params, level: int, pad: int):
    """Per-digit decomposition tables, padded to a uniform [pad, alpha]
    shape, as host numpy arrays.

    Padded digits carry inv_w = 0, so their extended digit (and therefore
    their key inner product) is identically zero — the key rows backing a
    padded digit never matter.
    """
    kst = params.ks_tables(level)
    groups = kst["groups"]
    dnum = len(groups)
    assert dnum <= pad
    M = len(kst["basis"])
    alpha = max(len(g["limbs"]) for g in groups)
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

    Keys are resident digit-sharded: `key_shards` pads a SwitchKey's
    [dnum, L_tot, N] arrays to a D-divisible digit count and places them
    with NamedSharding(P(axis, None, None)), so each chip persistently holds
    only its 1/D of every switch key.  Per (level, program) a jitted
    shard_map program is built once and cached.
    """

    def __init__(self, params, tabs, mesh: Mesh, axis: str = "limb"):
        self.params = params
        self.tabs = tabs
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.shape[axis]
        # one global digit pad for every level, so a key is sharded once
        self.pad = ((params.dnum + self.D - 1) // self.D) * self.D
        self._fns = {}
        self._key_cache: dict[int, tuple] = {}
        # XLA's CPU backend runs each virtual device's program on its own
        # thread and matches in-process collectives by rendezvous; two
        # collective programs dispatched asynchronously can interleave their
        # per-device launches and cross-match (wrong psum pairing) or
        # deadlock ("expected 8 threads, only 5 arrived").  Real TPUs
        # sequence launches per device, so this only needs host-side
        # serialization on the host-platform validation mesh.
        self._serialize = mesh.devices.flat[0].platform == "cpu"

    def _run(self, fn, *args):
        out = fn(*args)
        if self._serialize:
            jax.block_until_ready(out)
        return out

    # -- digit-sharded key residency ----------------------------------------
    def key_shards(self, key):
        """(kb, ka): [pad, L_tot, N] digit-sharded over the mesh axis."""
        ent = self._key_cache.get(id(key))
        if ent is not None:
            return ent[1], ent[2]
        kb = jnp.asarray(key.b)
        ka = jnp.asarray(key.a)
        if kb.shape[0] < self.pad:
            z = jnp.zeros((self.pad - kb.shape[0],) + kb.shape[1:], kb.dtype)
            kb = jnp.concatenate([kb, z])
            ka = jnp.concatenate([ka, z])
        sh = NamedSharding(self.mesh, P(self.axis, None, None))
        kb = jax.device_put(kb, sh)
        ka = jax.device_put(ka, sh)
        # hold a strong ref to `key` so its id() cannot be recycled
        self._key_cache[id(key)] = (key, kb, ka)
        return kb, ka

    # -- per-level programs ---------------------------------------------------
    def _build(self, level: int, cap: int | None = None):
        params, tabs, mesh, axis = self.params, self.tabs, self.mesh, self.axis
        t = _padded_digit_tables(params, level, self.pad)

        rows_b = _rows(params, level, True)
        tr_b = _tabs_rows(tabs, rows_b)
        tr_q = _tabs_rows(tabs, _rows(params, level, False))
        # physical key rows for (q_0..q_level | specials): full-basis layout,
        # or the level-capped layout of keys.SwitchKey.cap
        rows_key = ops_impl._key_rows(params, level, cap)
        q_basis = jnp.asarray(t["basis"]).reshape(1, -1, 1)
        q_host = [int(q) for q in np.asarray(tr_b["q"])]
        # 2^16 Shoup pairs per basis prime, for the exact two-half psum fold
        sh_w = jnp.asarray([(1 << 16) % q for q in q_host],
                           dtype=jnp.uint32).reshape(1, -1, 1)
        sh_sh = jnp.asarray([rns.shoup_precompute((1 << 16) % q, q)
                             for q in q_host],
                            dtype=jnp.uint32).reshape(1, -1, 1)

        digit_tabs = tuple(jnp.asarray(t[k]) for k in
                           ("idx", "q_limb", "inv_w", "inv_sh", "conv_w",
                            "conv_sh"))
        dspec = P(axis)      # leading digit axis sharded

        def _decompose_local(c_plain, idx, q_limb, inv_w, inv_sh, conv_w,
                             conv_sh):
            """Extend + NTT this shard's digits: [per, M, N]."""
            qb = tr_b["q"].reshape((-1, 1))
            outs = []
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
                outs.append(ntt_rows(dm, tr_b))               # [M, N]
            return jnp.stack(outs)

        def _inner_local(d_eval, kb, ka):
            """Partial key inner product of this shard's digits + exact
            modular all-reduce.  psum overflows uint32, so reduce in two
            uint32-exact halves (each < 2^31) and fold mod q afterwards."""
            qb = tr_b["q"].reshape((-1, 1))
            qinv_b = tr_b["qinv"].reshape((-1, 1))
            acc_b = acc_a = None
            for j in range(d_eval.shape[0]):
                tb = rns.mont_mul(d_eval[j], kb[j][rows_key], qb, qinv_b)
                ta = rns.mont_mul(d_eval[j], ka[j][rows_key], qb, qinv_b)
                acc_b = tb if acc_b is None else rns.add_mod(acc_b, tb, qb)
                acc_a = ta if acc_a is None else rns.add_mod(acc_a, ta, qb)
            both = jnp.stack([acc_b, acc_a])                  # [2, M, N]
            lo = jax.lax.psum(both & jnp.uint32(0xFFFF), axis)
            hi = jax.lax.psum(both >> 16, axis)
            qv = qb[None]
            magic = tr_b["magic"].reshape((1, -1, 1))
            lo_r = rns.barrett_reduce(lo, qv, magic)
            hi_r = rns.barrett_reduce(hi, qv, magic)
            return rns.add_mod(lo_r, rns.shoup_mul(hi_r, sh_w, sh_sh, qv), qv)

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(),) + (dspec,) * 6, out_specs=dspec)
        def _decompose_sm(c_plain, *dt):
            return _decompose_local(c_plain, *dt)

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(dspec, dspec, dspec), out_specs=P())
        def _inner_sm(d_eval, kb, ka):
            return _inner_local(d_eval, kb, ka)

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(dspec, P(), dspec, dspec), out_specs=P())
        def _inner_perm_sm(d_eval, perm, kb, ka):
            return _inner_local(d_eval[..., perm], kb, ka)

        def _c_plain(c_eval):
            c_coeff = intt_rows(c_eval, tr_q)
            return rns.from_mont(c_coeff, tr_q["q"].reshape(-1, 1),
                                 tr_q["qinv"].reshape(-1, 1))

        def _ks_body(c_eval, kb, ka):
            d_eval = _decompose_sm(_c_plain(c_eval), *digit_tabs)
            acc = _inner_sm(d_eval, kb, ka)
            return _mod_down_specials(params, tabs, acc, level)

        q_add = tr_q["q"].reshape((-1, 1))

        @jax.jit
        def keyswitch(c_eval, kb, ka):
            ba = _ks_body(c_eval, kb, ka)
            return ba[0], ba[1]

        @jax.jit
        def relin(data, kb, ka):
            ba = _ks_body(data[2], kb, ka)
            return jnp.stack([rns.add_mod(data[0], ba[0], q_add),
                              rns.add_mod(data[1], ba[1], q_add)])

        @jax.jit
        def galois(data, perm, kb, ka):
            p0 = data[0][..., perm]
            ba = _ks_body(data[1][..., perm], kb, ka)
            return jnp.stack([rns.add_mod(p0, ba[0], q_add), ba[1]])

        @jax.jit
        def decompose(c_eval):
            return _decompose_sm(_c_plain(c_eval), *digit_tabs)

        @jax.jit
        def hoisted_apply(data, d_eval, perm, kb, ka):
            p0 = data[0][..., perm]
            acc = _inner_perm_sm(d_eval, perm, kb, ka)
            ba = _mod_down_specials(params, tabs, acc, level)
            return jnp.stack([rns.add_mod(p0, ba[0], q_add), ba[1]])

        return dict(keyswitch=keyswitch, relin=relin, galois=galois,
                    decompose=decompose, hoisted_apply=hoisted_apply)

    def _prog(self, level: int, cap: int | None = None) -> dict:
        k = (level, cap)
        if k not in self._fns:
            self._fns[k] = self._build(level, cap)
        return self._fns[k]

    # -- public programs ------------------------------------------------------
    def keyswitch(self, c_eval, key):
        kb, ka = self.key_shards(key)
        return self._run(self._prog(c_eval.shape[0] - 1,
                                    getattr(key, "cap", None))["keyswitch"],
                         c_eval, kb, ka)

    # backward-compat alias (round-1 API)
    __call__ = keyswitch

    def relin(self, data, key):
        kb, ka = self.key_shards(key)
        return self._run(self._prog(data.shape[1] - 1,
                                    getattr(key, "cap", None))["relin"],
                         data, kb, ka)

    def galois(self, data, perm, key):
        kb, ka = self.key_shards(key)
        return self._run(self._prog(data.shape[1] - 1,
                                    getattr(key, "cap", None))["galois"],
                         data, perm, kb, ka)

    def decompose(self, c_eval):
        """Digit-sharded shared decomposition for rotation hoisting."""
        return self._run(self._prog(c_eval.shape[0] - 1)["decompose"],
                         c_eval)

    def hoisted_apply(self, data, d_eval, perm, key):
        kb, ka = self.key_shards(key)
        return self._run(self._prog(data.shape[1] - 1,
                                    getattr(key, "cap", None))
                         ["hoisted_apply"], data, d_eval, perm, kb, ka)
