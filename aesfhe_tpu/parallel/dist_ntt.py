"""Distributed 4-step NTT: one logical transform sharded over a mesh axis.

NTT-stage parallelism (SURVEY.md section 2.3 item 3): the ring dimension N
of one logical ciphertext polynomial is split across chips, with a single
all-to-all between the two matmul phases of the 4-step factorization riding
ICI.  The reference has no analogue at all — its ring lives inside one
`desilofhe` device (/root/reference/engine_context.py:38).

Layout (A = sqrt(N); see core/mxu_ntt.py for the factorization):

  forward:  Z[n2, n1] column-sharded (n1 over the axis)
            stage 1  S = F1 @ Z       — local (contraction n2 is unsharded)
            twiddle  B = S * T        — local (T column shard passed in)
            ALL-TO-ALL                — [A, A/D] -> [A/D, A] (rows i_a local)
            stage 2  Out = B @ G      — local (contraction n1 now unsharded)
            result row-sharded: out[i_a, i_b], i = A*i_a + i_b

  inverse runs the same shape backwards (rows in, columns out), so
  inv(fwd(x)) round-trips the sharding with exactly two all-to-alls.

Everything reuses the exact int8 MXU digit machinery from core/mxu_ntt —
bit-identical to the single-device transform (asserted in
tests/test_parallel.py) — so the distributed path is also MXU-resident on
real hardware, not a CPU-only demo.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core import rns, mxu_ntt
from ..core.mxu_ntt import (NDIG, _byte_digits, _combine, _einsum_i8,
                            build_tables)


def _digits_rows_rect(x):
    """uint32 [..., L, R, C] -> int8 [..., L, NDIG*R, C]."""
    *lead, L, R, C = x.shape
    d = _byte_digits(x)                          # [..., L, R, C, 4]
    d = jnp.moveaxis(d, -1, -3)                  # [..., L, 4, R, C]
    return d.reshape(tuple(lead) + (L, NDIG * R, C))


def _digits_cols_rect(x):
    """uint32 [..., L, R, C] -> int8 [..., L, R, NDIG*C]."""
    *lead, L, R, C = x.shape
    d = _byte_digits(x)                          # [..., L, R, C, 4]
    d = jnp.moveaxis(d, -1, -2)                  # [..., L, R, 4, C]
    return d.reshape(tuple(lead) + (L, R, NDIG * C))


def _fwd_local(x_loc, t_w_loc, t_sh_loc, mx, axis_name):
    """Per-shard forward body: x_loc [L, A, C] (column shard of Z)."""
    qv = mx["q"].reshape(-1, 1, 1)
    zd = _digits_rows_rect(x_loc)                          # [L, 4A, C]
    s1 = _einsum_i8("lij,ljk->lik", mx["f"], zd)           # [L, 4A, C]
    L, _, C = s1.shape
    A = mx["t_w"].shape[-2]
    s1 = s1.reshape(L, NDIG, A, C)
    S = _combine(s1, mx["fcorr"], mx, rowwise=True)        # [L, A, C]
    B = rns.shoup_mul(S, t_w_loc, t_sh_loc, qv)
    # redistribute: column shard (n1) -> row shard (i_a); peers concat in
    # device order along columns, matching the global n1 block order
    Bt = jax.lax.all_to_all(B, axis_name, split_axis=1, concat_axis=2,
                            tiled=True)                    # [L, A/D, A]
    bd = _digits_cols_rect(Bt)                             # [L, A/D, 4A]
    s2 = _einsum_i8("lij,ljk->lik", bd, mx["g"])           # [L, A/D, 4A]
    R = Bt.shape[1]
    s2 = jnp.moveaxis(s2.reshape(L, R, NDIG, A), -2, -3)   # [L, ND, A/D, A]
    return _combine(s2, mx["gcorr"], mx, rowwise=False)    # [L, A/D, A]


def _inv_local(x_loc, ti_w_loc, ti_sh_loc, mx, axis_name):
    """Per-shard inverse body: x_loc [L, A/D, A] (row shard of Out)."""
    qv = mx["q"].reshape(-1, 1, 1)
    od = _digits_cols_rect(x_loc)                          # [L, A/D, 4A]
    s1 = _einsum_i8("lij,ljk->lik", od, mx["gi"])          # [L, A/D, 4A]
    L, R, _ = s1.shape
    A = mx["ti_w"].shape[-1]
    s1 = jnp.moveaxis(s1.reshape(L, R, NDIG, A), -2, -3)
    B = _combine(s1, mx["gicorr"], mx, rowwise=False)      # [L, A/D, A]
    S = rns.shoup_mul(B, ti_w_loc, ti_sh_loc, qv)
    # row shard (i_a) -> column shard (n1)
    St = jax.lax.all_to_all(S, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)                    # [L, A, A/D]
    sd = _digits_rows_rect(St)                             # [L, 4A, A/D]
    s2 = _einsum_i8("lij,ljk->lik", mx["fi"], sd)
    C = St.shape[2]
    s2 = s2.reshape(L, NDIG, A, C)
    return _combine(s2, mx["ficorr"], mx, rowwise=True)    # [L, A, C]


class DistNTT:
    """Sharded negacyclic NTT over `mesh` axis `axis` for ring size n.

    fwd(x): x uint32 [L, A, A] natural-order coefficients (Montgomery),
            sharded P(None, None, axis) -> bitrev eval order [L, A, A]
            sharded P(None, axis, None).
    inv(y): the exact inverse, shardings swapped back.

    Flat [L, N] views: fwd input shards are n1 = i mod A strides; use
    pack/unpack below to move between flat host arrays and the 2D layout.
    """

    def __init__(self, params, mesh: Mesh, axis: str = "limb",
                 level: int | None = None):
        n = params.n
        logn = n.bit_length() - 1
        assert logn % 2 == 0, "4-step NTT needs even log2(N)"
        self.A = 1 << (logn // 2)
        self.D = mesh.shape[axis]
        assert self.A % self.D == 0, "axis size must divide sqrt(N)"
        self.mesh = mesh
        self.axis = axis
        host = build_tables(n, params.all_primes, tuple(params.tables.psi))
        nrows = params.num_q if level is None else level + 1
        ri = np.arange(nrows, dtype=np.int32)
        # every table has a leading per-prime axis; keep the active rows.
        # Host numpy (not jnp): closed-over device-committed arrays would
        # pin the compiled program to local device 0, which breaks when the
        # mesh spans processes (parallel.multihost); numpy closures compile
        # to replicated constants on whatever mesh the jit runs over.
        self.mx = {k: np.asarray(v)[ri] for k, v in host.items()}
        in_spec = P(None, None, axis)
        out_spec = P(None, axis, None)
        tw_spec = P(None, None, axis)
        ti_spec = P(None, axis, None)
        mxs = self.mx

        @jax.jit
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(in_spec, tw_spec, tw_spec),
                           out_specs=out_spec)
        def _fwd(x, t_w, t_sh):
            return _fwd_local(x, t_w, t_sh, mxs, axis)

        @jax.jit
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(out_spec, ti_spec, ti_spec),
                           out_specs=in_spec)
        def _inv(y, ti_w, ti_sh):
            return _inv_local(y, ti_w, ti_sh, mxs, axis)

        self._fwd, self._inv = _fwd, _inv

    def fwd(self, x):
        return self._fwd(x, self.mx["t_w"], self.mx["t_sh"])

    def inv(self, y):
        return self._inv(y, self.mx["ti_w"], self.mx["ti_sh"])

    # flat <-> blocked views -------------------------------------------------
    def pack(self, flat):
        """[L, N] natural order -> [L, A, A] Z[n2, n1] (n = n1 + A*n2)."""
        L = flat.shape[0]
        return flat.reshape(L, self.A, self.A)

    def unpack_eval(self, blocked):
        """[L, A, A] Out[i_a, i_b] -> [L, N] with i = A*i_a + i_b."""
        L = blocked.shape[0]
        return blocked.reshape(L, self.A * self.A)
