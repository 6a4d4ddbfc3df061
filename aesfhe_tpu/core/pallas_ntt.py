"""Pallas TPU kernel: fused negacyclic NTT (all stages VMEM-resident).

The XLA stage-by-stage NTT (core/ntt.py) round-trips HBM ~logN times per
transform; this kernel keeps one limb's polynomial in VMEM for the whole
butterfly network (grid = one program per RNS limb).

Layout strategy for the 8x128-lane VPU:
  - data viewed as [R, 128] (row-major); stages with butterfly distance
    t >= 128 pair ROWS -> pure sublane reshapes.
  - the last 7 stages (t = 64..1) pair elements WITHIN a 128 lane group, so
    the data is transposed in 128x128 tiles (lane distance becomes sublane
    distance), the tail stages run as row butterflies with precomputed
    transposed-layout twiddle tables, and the tiles are transposed back.
Output is bit-identical to ntt_fwd_unrolled (asserted in tests/test_ntt.py).

This is the "hot ops as Pallas kernels" requirement from the build brief;
see /opt/skills/guides/pallas_guide.md for the programming model.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rns

LANES = 128
TAIL_STAGES = 7          # stages with t = 64, 32, ..., 1


def _shoup(x, w, w_sh, q):
    hi = rns.mulhi32(x, w_sh)
    r = x * w - hi * q
    return jnp.where(r >= q, r - q, r)


def build_row_tables(n: int, w: np.ndarray, w_sh: np.ndarray):
    """Per-ROW twiddles for the row stages (t >= 128): [L, S_row, R] x2.
    Row r of stage s uses group twiddle w[2^s + (r >> (log2R - s))]."""
    L = w.shape[0]
    logn = n.bit_length() - 1
    R = n // LANES
    logR = R.bit_length() - 1
    s_row = logn - TAIL_STAGES
    rows = np.arange(R)
    out_w = np.zeros((L, s_row, R), dtype=np.uint32)
    out_sh = np.zeros((L, s_row, R), dtype=np.uint32)
    for s in range(s_row):
        m = 1 << s
        idx = m + (rows >> (logR - s))
        out_w[:, s, :] = w[:, idx]
        out_sh[:, s, :] = w_sh[:, idx]
    return out_w, out_sh


def build_tail_tables(n: int, w: np.ndarray, w_sh: np.ndarray):
    """Per-element twiddles for the 7 tail stages, in TRANSPOSED tile layout.

    w/w_sh: [L, N] master tables (w[m+i] = stage twiddle of group i).
    Returns [L, 7, N] uint32 x2 where entry (s', o') is the twiddle applied
    at transposed-layout flat position o' during tail stage s'.
    """
    L = w.shape[0]
    logn = n.bit_length() - 1
    R = n // LANES
    o = np.arange(n)
    # original flat index o = row*128 + col; transposed position within
    # 128x128 tiles: block b = row // 128, o' = (b*128 + col)*R' ... compute
    # the forward map orig->transposed then invert it.
    row, col = o // LANES, o % LANES
    if R >= LANES:
        b = row // LANES
        r_in = row % LANES
        # transposed: row' = b*128 + col, col' = r_in
        o_t = (b * LANES + col) * LANES + r_in
    else:
        # single RxLANES tile -> LANESxR
        o_t = col * R + row
    inv = np.zeros(n, dtype=np.int64)
    inv[o_t] = o                    # transposed position -> original index
    tails_w = np.zeros((L, TAIL_STAGES, n), dtype=np.uint32)
    tails_sh = np.zeros((L, TAIL_STAGES, n), dtype=np.uint32)
    for si in range(TAIL_STAGES):
        s = (logn - TAIL_STAGES) + si          # global stage number
        m = 1 << s
        orig = inv                              # [n] original index at pos
        group = orig >> (logn - s)
        tw_idx = m + group
        tails_w[:, si, :] = w[:, tw_idx]
        tails_sh[:, si, :] = w_sh[:, tw_idx]
    return tails_w, tails_sh


def build_inv_tables(n: int, wi: np.ndarray, wi_sh: np.ndarray):
    """Twiddle tables for the inverse kernel.

    Returns (tail_w, tail_sh, row_w, row_sh):
      tail: [L, 7, N] transposed-layout per-element twiddles for GS stages
            k = 0..6 (t = 1..64): wi[m + (orig >> (k+1))], m = N/2^(k+1)
      row:  [L, S_row, R] per-row twiddles for stages k = 7..logn-1:
            wi[m + (r >> (k-6))]
    """
    L = wi.shape[0]
    logn = n.bit_length() - 1
    R = n // LANES
    o = np.arange(n)
    row, col = o // LANES, o % LANES
    if R >= LANES:
        b = row // LANES
        o_t = (b * LANES + col) * LANES + (row % LANES)
    else:
        o_t = col * R + row
    inv = np.zeros(n, dtype=np.int64)
    inv[o_t] = o
    tail_w = np.zeros((L, TAIL_STAGES, n), dtype=np.uint32)
    tail_sh = np.zeros((L, TAIL_STAGES, n), dtype=np.uint32)
    for k in range(TAIL_STAGES):
        m = n >> (k + 1)
        idx = m + (inv >> (k + 1))
        tail_w[:, k, :] = wi[:, idx]
        tail_sh[:, k, :] = wi_sh[:, idx]
    s_row = logn - TAIL_STAGES
    rows = np.arange(R)
    row_w = np.zeros((L, s_row, R), dtype=np.uint32)
    row_sh = np.zeros((L, s_row, R), dtype=np.uint32)
    for i, k in enumerate(range(TAIL_STAGES, logn)):
        m = n >> (k + 1)
        idx = m + (rows >> (k - TAIL_STAGES + 1))
        row_w[:, i, :] = wi[:, idx]
        row_sh[:, i, :] = wi_sh[:, idx]
    return tail_w, tail_sh, row_w, row_sh


def _transpose_tiles(x, R: int):
    """[R, 128] <-> transposed tile layout (see build_tail_tables)."""
    if R >= LANES:
        B = R // LANES
        t = x.reshape(B, LANES, LANES)
        t = jnp.swapaxes(t, 1, 2)
        return t.reshape(R, LANES)
    t = jnp.swapaxes(x.reshape(R, LANES), 0, 1)   # [128, R]
    return t


def _untranspose_tiles(x, R: int):
    if R >= LANES:
        return _transpose_tiles(x, R)             # involution for square tiles
    return jnp.swapaxes(x, 0, 1)


def _fwd_kernel(logn: int, x_ref, rw_ref, rwsh_ref, tw_ref, twsh_ref, q_ref,
                o_ref):
    n = 1 << logn
    R = n // LANES
    q = q_ref[pl.program_id(0), 0]
    x = x_ref[0]
    # --- row stages: t >= 128 ---
    for s in range(logn - TAIL_STAGES):
        m = 1 << s
        t_r = R >> (s + 1)                       # t / 128 in rows
        xr = x.reshape(m, 2, t_r, LANES)
        u = xr[:, 0]
        v = xr[:, 1]
        tw = rw_ref[0, s].reshape(m, 2, t_r, 1)[:, 1]
        tws = rwsh_ref[0, s].reshape(m, 2, t_r, 1)[:, 1]
        wv = _shoup(v, tw, tws, q)
        x = jnp.concatenate(
            [jnp.where(u + wv >= q, u + wv - q, u + wv)[:, None],
             jnp.where(u >= wv, u - wv, u + q - wv)[:, None]],
            axis=1).reshape(R, LANES)
    # --- tail stages in transposed tiles ---
    xt = _transpose_tiles(x, R)                   # [R', C']
    Rp = xt.shape[0]
    for si in range(TAIL_STAGES):
        t = 1 << (TAIL_STAGES - 1 - si)           # 64 .. 1
        # transposed rows within each 128-row block pair at distance t
        blocks = Rp // LANES if Rp >= LANES else 1
        width = xt.shape[1]
        g = LANES // (2 * t)
        xr = xt.reshape(blocks, g, 2, t, width)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        tw_full = tw_ref[0, si].reshape(Rp, width)
        tws_full = twsh_ref[0, si].reshape(Rp, width)
        twr = tw_full.reshape(blocks, g, 2, t, width)[:, :, 1]
        twsr = tws_full.reshape(blocks, g, 2, t, width)[:, :, 1]
        wv = _shoup(v, twr, twsr, q)
        s_uv = u + wv
        s_uv = jnp.where(s_uv >= q, s_uv - q, s_uv)
        d_uv = jnp.where(u >= wv, u - wv, u + q - wv)
        xt = jnp.concatenate([s_uv[:, :, None], d_uv[:, :, None]],
                             axis=2).reshape(Rp, width)
    x = _untranspose_tiles(xt, R)
    o_ref[0] = x.reshape(R, LANES)


@functools.partial(jax.jit, static_argnums=(0, 7))
def ntt_fwd_pallas(n: int, x, rows_w, rows_sh, tails_w, tails_sh, q,
                   interpret: bool = False):
    """x: [L, N] -> [L, N] forward NTT, one Pallas program per limb."""
    L = x.shape[0]
    logn = n.bit_length() - 1
    R = n // LANES
    s_row = logn - TAIL_STAGES
    kernel = functools.partial(_fwd_kernel, logn)
    # TPU block shapes need last-two dims (8k, 128): ship everything [.., R, 128]
    x3 = x.reshape(L, R, LANES)
    rw4 = rows_w.reshape(L, s_row, R, 1)
    rwsh4 = rows_sh.reshape(L, s_row, R, 1)
    tw4 = tails_w.reshape(L, TAIL_STAGES, R, LANES)
    twsh4 = tails_sh.reshape(L, TAIL_STAGES, R, LANES)
    q2 = q.reshape(L, 1)
    out = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_row, R, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_row, R, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TAIL_STAGES, R, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TAIL_STAGES, R, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full [L,1] q table
        ],
        out_specs=pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, R, LANES), jnp.uint32),
        interpret=interpret,
    )(x3, rw4, rwsh4, tw4, twsh4, q2)
    return out.reshape(L, n)


def _inv_kernel(logn: int, x_ref, tw_ref, twsh_ref, rw_ref, rwsh_ref, q_ref,
                o_ref):
    n = 1 << logn
    R = n // LANES
    q = q_ref[pl.program_id(0), 0]
    x = x_ref[0]
    # --- tail GS stages (t = 1..64) in transposed tiles ---
    xt = _transpose_tiles(x, R)
    Rp = xt.shape[0]
    width = xt.shape[1]
    blocks = Rp // LANES if Rp >= LANES else 1
    for k in range(TAIL_STAGES):
        t = 1 << k
        g = LANES // (2 * t)
        xr = xt.reshape(blocks, g, 2, t, width)
        u = xr[:, :, 0]
        v = xr[:, :, 1]
        twr = tw_ref[0, k].reshape(blocks, g, 2, t, width)[:, :, 1]
        twsr = twsh_ref[0, k].reshape(blocks, g, 2, t, width)[:, :, 1]
        s_uv = u + v
        s_uv = jnp.where(s_uv >= q, s_uv - q, s_uv)
        d_uv = jnp.where(u >= v, u - v, u + q - v)
        d_uv = _shoup(d_uv, twr, twsr, q)
        xt = jnp.concatenate([s_uv[:, :, None], d_uv[:, :, None]],
                             axis=2).reshape(Rp, width)
    x = _untranspose_tiles(xt, R)
    # --- row GS stages (t >= 128) ---
    for i, k in enumerate(range(TAIL_STAGES, logn)):
        t_r = 1 << (k - TAIL_STAGES)
        m_r = R // (2 * t_r)
        xr = x.reshape(m_r, 2, t_r, LANES)
        u = xr[:, 0]
        v = xr[:, 1]
        twr = rw_ref[0, i].reshape(m_r, 2, t_r, 1)[:, 1]
        twsr = rwsh_ref[0, i].reshape(m_r, 2, t_r, 1)[:, 1]
        s_uv = u + v
        s_uv = jnp.where(s_uv >= q, s_uv - q, s_uv)
        d_uv = jnp.where(u >= v, u - v, u + q - v)
        d_uv = _shoup(d_uv, twr, twsr, q)
        x = jnp.concatenate([s_uv[:, None], d_uv[:, None]],
                            axis=1).reshape(R, LANES)
    o_ref[0] = x


@functools.partial(jax.jit, static_argnums=(0, 7))
def ntt_inv_pallas(n: int, x, tail_w, tail_sh, row_w, row_sh, q,
                   interpret: bool = False):
    """Inverse NTT (WITHOUT the final 1/N scaling -- callers fuse it into the
    next pointwise op or apply rns.shoup_mul with ninv)."""
    L = x.shape[0]
    logn = n.bit_length() - 1
    R = n // LANES
    s_row = logn - TAIL_STAGES
    kernel = functools.partial(_inv_kernel, logn)
    x3 = x.reshape(L, R, LANES)
    tw4 = tail_w.reshape(L, TAIL_STAGES, R, LANES)
    twsh4 = tail_sh.reshape(L, TAIL_STAGES, R, LANES)
    rw4 = row_w.reshape(L, s_row, R, 1)
    rwsh4 = row_sh.reshape(L, s_row, R, 1)
    q2 = q.reshape(L, 1)
    out = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TAIL_STAGES, R, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TAIL_STAGES, R, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_row, R, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_row, R, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, R, LANES), jnp.uint32),
        interpret=interpret,
    )(x3, tw4, twsh4, rw4, rwsh4, q2)
    return out.reshape(L, n)
