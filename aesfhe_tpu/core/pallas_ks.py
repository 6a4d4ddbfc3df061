"""Pallas prototype: fused key-switch digit inner product (VERDICT r4 #6).

The hybrid key-switch spends ~55% of its time on VPU-bound legs (PERF.md
key-switch anatomy): the digit basis extension and the key inner product
    acc_b = sum_j mont_mul(d_eval[j], key_b[j]);  acc_a likewise.
This module hand-tiles the INNER-PRODUCT leg as one Pallas TPU kernel so the
XLA-vs-Pallas question (BASELINE.json north star: "implemented as Pallas
kernels") is settled by measurement instead of assertion:

  - XLA path: the unrolled j-loop of rns.mont_mul/add_mod in
    ops_impl.ks_inner_and_moddown -- XLA fuses it into elementwise kernels
    of its own choosing.
  - Pallas path: `ks_inner_pallas` -- one kernel, grid over (M limb rows x
    N/lane tiles), J-digit accumulation entirely in VMEM registers, each
    input word read exactly once from HBM.

Run `scripts/bench_pallas_ks.py` on the device for the decision table
(recorded in PERF.md "Pallas verdict").  The kernel is exact (same uint32
Montgomery arithmetic, bit-identical output, asserted in
tests/test_native.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rns

# N is viewed as [R, 128] lanes; each grid step covers SUB sublanes of R
SUB = 64
LANES = 128


def _kernel(q_ref, qinv_ref, d_ref, kb_ref, ka_ref, out_ref):
    # q/qinv ride SMEM as the FULL [M] tables (Mosaic rejects rank-1 blocks
    # smaller than the array off the 128-lane tiling); select this grid
    # row's scalars by program_id
    m = pl.program_id(0)
    q = q_ref[m]
    qinv = qinv_ref[m]
    J = d_ref.shape[0]
    acc_b = acc_a = None
    for j in range(J):                      # static unroll over digits
        d = d_ref[j, 0]
        tb = rns.mont_mul(d, kb_ref[j, 0], q, qinv)
        ta = rns.mont_mul(d, ka_ref[j, 0], q, qinv)
        acc_b = tb if acc_b is None else rns.add_mod(acc_b, tb, q)
        acc_a = ta if acc_a is None else rns.add_mod(acc_a, ta, q)
    out_ref[0, 0] = acc_b
    out_ref[1, 0] = acc_a


@functools.partial(jax.jit, static_argnames=())
def ks_inner_pallas(d_eval, key_b, key_a, q_arr, qinv_arr):
    """[J, M, N] digits x keys -> [2, M, N] accumulated partial products.

    q_arr/qinv_arr: [M] uint32 per-limb modulus / -q^-1 mod 2^32 constants
    (SMEM-prefetched per grid row).  Bit-identical to the XLA loop.
    """
    J, M, N = d_eval.shape
    R = N // LANES
    assert R % SUB == 0, (N, "N must tile into (SUB x 128) lanes")
    d4 = d_eval.reshape(J, M, R, LANES)
    kb4 = key_b.reshape(J, M, R, LANES)
    ka4 = key_a.reshape(J, M, R, LANES)

    def tile_map(m, r):
        return (0, m, r, 0)

    in_spec = pl.BlockSpec((J, 1, SUB, LANES), tile_map,
                           memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((M,), lambda m, r: (0,), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(M, R // SUB),
        in_specs=[scal, scal, in_spec, in_spec, in_spec],
        out_specs=pl.BlockSpec((2, 1, SUB, LANES),
                               lambda m, r: (0, m, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, M, R, LANES), jnp.uint32),
    )(q_arr, qinv_arr, d4, kb4, ka4)
    return out.reshape(2, M, N)


@functools.partial(jax.jit, static_argnames=("level", "shift"))
def ks_inner_pallas_rows(d_eval, key_b, key_a, q_arr, qinv_arr,
                         level: int, shift: int):
    """Like ks_inner_pallas, but the switch key stays in its stored
    (level-capped) row layout: physical key row for logical limb m is
    `m + shift*(m > level)` (the two-segment _key_rows map: active q
    rows are contiguous from 0, special rows sit after the cap), resolved
    inside the BlockSpec index map so the kernel DMAs key tiles straight
    from HBM — no [J, M, N] gathered copy.  Pallas index maps may not
    capture array constants, hence the affine form instead of a table.
    """
    J, M, N = d_eval.shape
    R = N // LANES
    assert R % SUB == 0, (N, "N must tile into (SUB x 128) lanes")
    d4 = d_eval.reshape(J, M, R, LANES)
    Mk = key_b.shape[1]
    kb4 = key_b[:J].reshape(J, Mk, R, LANES)
    ka4 = key_a[:J].reshape(J, Mk, R, LANES)

    in_spec = pl.BlockSpec((J, 1, SUB, LANES), lambda m, r: (0, m, r, 0),
                           memory_space=pltpu.VMEM)
    key_spec = pl.BlockSpec((J, 1, SUB, LANES),
                            lambda m, r: (0, m + shift * (m > level), r, 0),
                            memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((M,), lambda m, r: (0,), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(M, R // SUB),
        in_specs=[scal, scal, in_spec, key_spec, key_spec],
        out_specs=pl.BlockSpec((2, 1, SUB, LANES),
                               lambda m, r: (0, m, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, M, R, LANES), jnp.uint32),
    )(q_arr, qinv_arr, d4, kb4, ka4)
    return out.reshape(2, M, N)


def ks_inner_xla(d_eval, key_b, key_a, q_arr, qinv_arr):
    """The XLA reference: identical math, fusion left to the compiler."""
    q = q_arr.reshape(1, -1, 1)
    qinv = qinv_arr.reshape(1, -1, 1)
    tb = rns.mont_mul(d_eval, key_b, q, qinv)
    ta = rns.mont_mul(d_eval, key_a, q, qinv)
    qb = q_arr.reshape(-1, 1)
    acc_b = tb[0]
    acc_a = ta[0]
    for j in range(1, d_eval.shape[0]):
        acc_b = rns.add_mod(acc_b, tb[j], qb)
        acc_a = rns.add_mod(acc_a, ta[j], qb)
    return jnp.stack([acc_b, acc_a])
