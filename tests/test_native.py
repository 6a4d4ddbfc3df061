"""Native host-kernel tests: the C++ kernels (aesfhe_tpu/native) must be
bit-identical to the JAX reference paths in core/rns.py / core/ntt.py.
This is the contract that lets keygen and other host legs bypass XLA."""
import numpy as np
import jax.numpy as jnp
import pytest

from aesfhe_tpu import native
from aesfhe_tpu.core import rns, ntt, ops_impl
from aesfhe_tpu.core.params import get_params

pytestmark = pytest.mark.skipif(not native.get_lib(),
                                reason="native host library unavailable")


@pytest.fixture(scope="module")
def small():
    params = get_params("tiny")
    rng = np.random.default_rng(3)
    L = params.L_tot
    x = np.zeros((L, params.n), dtype=np.uint32)
    for i, q in enumerate(params.all_primes):
        x[i] = rng.integers(0, q, params.n, dtype=np.uint32)
    return params, x


def test_to_eval_matches_jax(small):
    params, x = small
    rows = np.arange(params.L_tot, dtype=np.int32)
    nat = native.to_eval_batch(x, params.q_arr, params.qinv_arr,
                               params.r2_arr, params.tables.w,
                               params.tables.w_sh)
    tabs = ops_impl.DeviceTables.build(params)
    tr = ops_impl._tabs_rows(tabs, rows)
    q = tr["q"].reshape((-1, 1))
    xm = rns.to_mont(jnp.asarray(x), q, tr["qinv"].reshape((-1, 1)),
                     tr["r2"].reshape((-1, 1)))
    ref = np.asarray(ops_impl.ntt_rows(xm, tr))
    assert np.array_equal(nat, ref)


def test_ntt_fwd_matches_jax(small):
    params, x = small
    t = params.tables
    nat = native.ntt_fwd_batch(x, params.q_arr, t.w, t.w_sh)
    ref = np.asarray(ntt.ntt_fwd_unrolled(
        jnp.asarray(x), jnp.asarray(t.w), jnp.asarray(t.w_sh),
        jnp.asarray(t.q)))
    assert np.array_equal(nat, ref)


def test_ntt_inv_roundtrip_and_matches_jax(small):
    params, x = small
    t = params.tables
    fwd = native.ntt_fwd_batch(x, params.q_arr, t.w, t.w_sh)
    inv = native.ntt_inv_batch(fwd, params.q_arr, t.wi, t.wi_sh,
                               t.ninv, t.ninv_sh)
    assert np.array_equal(inv, x)
    ref = np.asarray(ntt.ntt_inv_unrolled(
        jnp.asarray(fwd), jnp.asarray(t.wi), jnp.asarray(t.wi_sh),
        jnp.asarray(t.q), jnp.asarray(t.ninv), jnp.asarray(t.ninv_sh)))
    assert np.array_equal(inv, ref)


def test_from_mont_matches_jax(small):
    params, x = small
    nat = native.from_mont_batch(x, params.q_arr, params.qinv_arr)
    q = jnp.asarray(params.q_arr).reshape((-1, 1))
    ref = np.asarray(rns.from_mont(
        jnp.asarray(x), q, jnp.asarray(params.qinv_arr).reshape((-1, 1))))
    assert np.array_equal(nat, ref)


def test_inputs_not_mutated(small):
    params, x = small
    before = x.copy()
    native.ntt_fwd_batch(x, params.q_arr, params.tables.w,
                         params.tables.w_sh)
    assert np.array_equal(x, before)


def test_pallas_ks_inner_bit_exact():
    """The Pallas key-switch inner-product kernel (core/pallas_ks.py) must
    be bit-identical to the XLA loop on the same uint32 Montgomery math
    (interpret mode on CPU; the real-device timing lives in
    scripts/bench_pallas_ks.py and PERF.md's Pallas verdict)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from aesfhe_tpu.core import pallas_ks
    from aesfhe_tpu.core.params import get_params
    from aesfhe_tpu.core import rns

    p = get_params("tiny")
    J, M, N = 3, 6, 16384        # N must tile into (64 x 128) lanes
    rng = np.random.default_rng(5)
    qs = np.asarray(p.all_primes[:M], dtype=np.uint32)
    qinv = np.asarray([rns.montgomery_consts(int(q))[0] for q in qs],
                      dtype=np.uint32)
    d = np.stack([np.stack([rng.integers(0, q, N, dtype=np.uint32)
                            for q in qs]) for _ in range(J)])
    kb = np.stack([np.stack([rng.integers(0, q, N, dtype=np.uint32)
                             for q in qs]) for _ in range(J)])
    ka = np.stack([np.stack([rng.integers(0, q, N, dtype=np.uint32)
                             for q in qs]) for _ in range(J)])
    want = np.asarray(pallas_ks.ks_inner_xla(
        jnp.asarray(d), jnp.asarray(kb), jnp.asarray(ka),
        jnp.asarray(qs), jnp.asarray(qinv)))
    # interpret=True: run the kernel logic on CPU without Mosaic
    import functools
    inner = functools.partial(pl.pallas_call, interpret=True)
    orig = pl.pallas_call
    pl.pallas_call = inner
    try:
        pallas_ks.ks_inner_pallas._clear_cache()
        got = np.asarray(pallas_ks.ks_inner_pallas(
            jnp.asarray(d), jnp.asarray(kb), jnp.asarray(ka),
            jnp.asarray(qs), jnp.asarray(qinv)))
    finally:
        pl.pallas_call = orig
        pallas_ks.ks_inner_pallas._clear_cache()
    assert np.array_equal(got, want)


def test_pallas_ks_inner_rows_bit_exact():
    """The zero-copy rows variant (affine key-row map in the BlockSpec,
    PERF.md "the Pallas verdict") must match the XLA loop on a LEVEL-CAPPED
    key layout: logical limb m reads physical key row m + shift*(m > lvl)."""
    import functools
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from aesfhe_tpu.core import pallas_ks
    from aesfhe_tpu.core.params import get_params
    from aesfhe_tpu.core import rns

    p = get_params("tiny")
    J, N = 3, 16384
    lvl, cap, K = 3, 6, 2          # M = lvl+1+K = 6 active rows of Mk = 9
    M = lvl + 1 + K
    Mk = cap + 1 + K
    rng = np.random.default_rng(7)
    qk = np.asarray((p.all_primes * 3)[:Mk], dtype=np.uint32)
    rows = np.concatenate([np.arange(lvl + 1),
                           cap + 1 + np.arange(K)]).astype(np.int32)
    qs = qk[rows]
    qinv = np.asarray([rns.montgomery_consts(int(q))[0] for q in qs],
                      dtype=np.uint32)
    d = np.stack([np.stack([rng.integers(0, q, N, dtype=np.uint32)
                            for q in qs]) for _ in range(J)])
    kb = np.stack([np.stack([rng.integers(0, q, N, dtype=np.uint32)
                             for q in qk]) for _ in range(J)])
    ka = np.stack([np.stack([rng.integers(0, q, N, dtype=np.uint32)
                             for q in qk]) for _ in range(J)])
    want = np.asarray(pallas_ks.ks_inner_xla(
        jnp.asarray(d), jnp.asarray(kb[:, rows]), jnp.asarray(ka[:, rows]),
        jnp.asarray(qs), jnp.asarray(qinv)))
    shift = int(rows[-1] - (M - 1))
    inner = functools.partial(pl.pallas_call, interpret=True)
    orig = pl.pallas_call
    pl.pallas_call = inner
    try:
        pallas_ks.ks_inner_pallas_rows._clear_cache()
        got = np.asarray(pallas_ks.ks_inner_pallas_rows(
            jnp.asarray(d), jnp.asarray(kb), jnp.asarray(ka),
            jnp.asarray(qs), jnp.asarray(qinv), lvl, shift))
    finally:
        pl.pallas_call = orig
        pallas_ks.ks_inner_pallas_rows._clear_cache()
    assert np.array_equal(got, want)
