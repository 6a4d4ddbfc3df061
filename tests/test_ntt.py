"""NTT correctness: device NTT vs big-int host model, inverse round-trip,
negacyclic convolution semantics."""
import numpy as np
import jax.numpy as jnp
import pytest

from aesfhe_tpu.core import rns, ntt

N = 128


@pytest.fixture(scope="module")
def setup():
    q = rns.find_ntt_primes(28, 2 * N, 1)[0]
    psi = rns._find_primitive_2n_root(q, 2 * N)
    tabs = ntt.NTTTables(N, (q,))
    qinv, r2 = rns.montgomery_consts(q)
    return dict(q=q, psi=psi, tabs=tabs, qinv=qinv, r2=r2)


def _fwd(x_plain, s):
    qj = jnp.uint32(s["q"])
    xm = rns.to_mont(jnp.asarray(x_plain), qj, jnp.uint32(s["qinv"]),
                     jnp.uint32(s["r2"]))
    t = s["tabs"]
    f = ntt.ntt_fwd(xm, jnp.asarray(t.w), jnp.asarray(t.w_sh),
                    jnp.asarray(t.q))
    return f, np.asarray(rns.from_mont(f, qj, jnp.uint32(s["qinv"])))


def test_fwd_matches_host_model(setup):
    s = setup
    rng = np.random.default_rng(0)
    x = rng.integers(0, s["q"], (1, N)).astype(np.uint32)
    _, f = _fwd(x, s)
    ref = ntt.ntt_fwd_host(x[0].astype(object), s["q"], s["psi"])
    assert np.array_equal(f[0].astype(object), ref)


def test_eval_points_are_psi_powers(setup):
    s = setup
    exps = ntt.eval_order_exponents(N, s["q"], s["psi"])
    assert sorted(exps) == list(range(1, 2 * N, 2))
    rng = np.random.default_rng(1)
    coeffs = rng.integers(0, s["q"], N).astype(object)
    out = ntt.ntt_fwd_host(coeffs, s["q"], s["psi"])
    for i in range(0, N, 17):
        e = exps[i]
        val = sum(int(coeffs[k]) * pow(s["psi"], e * k, s["q"])
                  for k in range(N)) % s["q"]
        assert val == int(out[i])


def test_inverse_roundtrip(setup):
    s = setup
    rng = np.random.default_rng(2)
    x = rng.integers(0, s["q"], (1, N)).astype(np.uint32)
    f, _ = _fwd(x, s)
    t = s["tabs"]
    back = ntt.ntt_inv(f, jnp.asarray(t.wi), jnp.asarray(t.wi_sh),
                       jnp.asarray(t.q), jnp.asarray(t.ninv),
                       jnp.asarray(t.ninv_sh))
    qj = jnp.uint32(s["q"])
    bp = np.asarray(rns.from_mont(back, qj, jnp.uint32(s["qinv"])))
    assert np.array_equal(bp, x)


def test_negacyclic_convolution(setup):
    s = setup
    q = s["q"]
    rng = np.random.default_rng(3)
    a = rng.integers(0, q, (1, N)).astype(np.uint32)
    b = rng.integers(0, q, (1, N)).astype(np.uint32)
    fa, _ = _fwd(a, s)
    fb, _ = _fwd(b, s)
    qj, qinvj = jnp.uint32(q), jnp.uint32(s["qinv"])
    prod_eval = rns.mont_mul(fa, fb, qj, qinvj)
    t = s["tabs"]
    prod = ntt.ntt_inv(prod_eval, jnp.asarray(t.wi), jnp.asarray(t.wi_sh),
                       jnp.asarray(t.q), jnp.asarray(t.ninv),
                       jnp.asarray(t.ninv_sh))
    prod = np.asarray(rns.from_mont(prod, qj, qinvj))
    ref = np.zeros(N, dtype=object)
    for i in range(N):
        for j in range(N):
            k, sign = (i + j, 1) if i + j < N else (i + j - N, -1)
            ref[k] = (ref[k] + sign * int(a[0, i]) * int(b[0, j])) % q
    assert np.array_equal(prod[0].astype(object), ref)


def test_analytic_eval_order(setup):
    # params.py relies on sigma[i] == 2*bitrev(i)+1; pin it here against the
    # empirical monomial scan
    s = setup
    emp = np.asarray(ntt.eval_order_exponents(N, s["q"], s["psi"]))
    rev = ntt.bit_reverse_perm(N)
    assert np.array_equal(emp, 2 * rev + 1)


def test_mxu_ntt_matches_unrolled():
    """4-step MXU matmul NTT (core/mxu_ntt.py) is bit-identical to the
    butterfly reference, fwd + inv + batched leading dims."""
    from aesfhe_tpu.core import mxu_ntt
    n = 1 << 12
    primes = tuple(rns.find_ntt_primes(29, 2 * n, 3))
    tabs = ntt.NTTTables(n, primes)
    rng = np.random.default_rng(2)
    x = jnp.asarray(np.stack([rng.integers(0, q, n, dtype=np.uint32)
                              for q in primes]))
    w, wsh, q = (jnp.asarray(tabs.w), jnp.asarray(tabs.w_sh),
                 jnp.asarray(tabs.q))
    ref_f = ntt.ntt_fwd_unrolled(x, w, wsh, q)
    mx = {k: jnp.asarray(v) for k, v in
          mxu_ntt.build_tables(n, primes, tuple(tabs.psi)).items()}
    got_f = mxu_ntt.ntt_fwd_mxu(x, mx)
    assert np.array_equal(np.asarray(got_f), np.asarray(ref_f))
    ref_i = ntt.ntt_inv_unrolled(ref_f, jnp.asarray(tabs.wi),
                                 jnp.asarray(tabs.wi_sh), q,
                                 jnp.asarray(tabs.ninv),
                                 jnp.asarray(tabs.ninv_sh))
    got_i = mxu_ntt.ntt_inv_mxu(got_f, mx)
    assert np.array_equal(np.asarray(got_i), np.asarray(ref_i))
    xb = jnp.stack([x, x])
    gb = np.asarray(mxu_ntt.ntt_fwd_mxu(xb, mx))
    assert np.array_equal(gb[1], np.asarray(ref_f))


def test_mxu_engine_roundtrip(monkeypatch):
    """Whole engine (encrypt -> mul+rescale -> rotate -> decrypt) with the
    MXU NTT forced on: exercises keyswitch/rescale/mod-down dispatch."""
    monkeypatch.setenv("AESFHE_MXU_NTT", "1")
    from aesfhe_tpu.core.params import CKKSParams
    from aesfhe_tpu.core.engine import Engine
    p = CKKSParams(n=1 << 10, max_level=6, scale_bits=26,
                   num_special_primes=2)
    eng = Engine(p)
    sk = eng.create_secret_key()
    pk = eng.create_public_key(sk)
    rlk = eng.create_relinearization_key(sk)
    rot_keys = eng.create_fixed_rotation_key(sk, [3])
    rng = np.random.default_rng(3)
    a = rng.standard_normal(p.slot_count) + 1j * rng.standard_normal(
        p.slot_count)
    b = rng.standard_normal(p.slot_count) + 1j * rng.standard_normal(
        p.slot_count)
    ca = eng.encrypt(a, pk)
    cb = eng.encrypt(b, pk)
    prod = eng.multiply(ca, cb, rlk)
    got = eng.decrypt(prod, sk)
    assert np.max(np.abs(got - a * b)) < 1e-2
    rot = eng.rotate(ca, rot_keys, 3)
    assert np.max(np.abs(eng.decrypt(rot, sk) - np.roll(a, 3))) < 1e-3
