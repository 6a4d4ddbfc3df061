"""Exactness tests for the uint32 modular arithmetic layer against Python
big-int ground truth (the foundation everything else rests on)."""
import numpy as np
import jax.numpy as jnp
import pytest

from aesfhe_tpu.core import rns


@pytest.fixture(scope="module")
def prime():
    q = rns.find_ntt_primes(28, 2 * 1024, 1)[0]
    return q


def test_prime_props(prime):
    assert prime % (2 * 1024) == 1
    assert prime <= 1 << 30


def test_mulhi32(prime):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, 4096, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, 4096, dtype=np.uint32)
    hi = np.asarray(rns.mulhi32(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a.astype(object) * b.astype(object)) >> 32)
    assert np.array_equal(hi.astype(object), ref)


def test_montgomery_roundtrip_and_mul(prime):
    q = prime
    qinv, r2 = rns.montgomery_consts(q)
    rng = np.random.default_rng(1)
    a = rng.integers(0, q, 4096, dtype=np.uint32)
    b = rng.integers(0, q, 4096, dtype=np.uint32)
    qj, qinvj, r2j = jnp.uint32(q), jnp.uint32(qinv), jnp.uint32(r2)
    am = rns.to_mont(jnp.asarray(a), qj, qinvj, r2j)
    assert np.array_equal(np.asarray(rns.from_mont(am, qj, qinvj)), a)
    bm = rns.to_mont(jnp.asarray(b), qj, qinvj, r2j)
    pm = rns.mont_mul(am, bm, qj, qinvj)
    p = np.asarray(rns.from_mont(pm, qj, qinvj))
    ref = (a.astype(object) * b.astype(object)) % q
    assert np.array_equal(p.astype(object), ref)


def test_shoup_mul(prime):
    q = prime
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 32, 4096, dtype=np.uint32)  # any uint32 input
    w = int(rng.integers(0, q))
    wsh = rns.shoup_precompute(w, q)
    s = np.asarray(rns.shoup_mul(jnp.asarray(a), jnp.uint32(w),
                                 jnp.uint32(wsh), jnp.uint32(q)))
    assert np.array_equal(s.astype(object), (a.astype(object) * w) % q)


def test_barrett_reduce(prime):
    q = prime
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 32, 4096, dtype=np.uint32)
    magic = rns.barrett_magic(q)
    r = np.asarray(rns.barrett_reduce(jnp.asarray(x), jnp.uint32(q),
                                      jnp.uint32(magic)))
    assert np.array_equal(r.astype(object), x.astype(object) % q)


def test_add_sub_neg(prime):
    q = prime
    rng = np.random.default_rng(4)
    a = rng.integers(0, q, 1000, dtype=np.uint32)
    b = rng.integers(0, q, 1000, dtype=np.uint32)
    qj = jnp.uint32(q)
    assert np.array_equal(
        np.asarray(rns.add_mod(jnp.asarray(a), jnp.asarray(b), qj)).astype(object),
        (a.astype(object) + b) % q)
    assert np.array_equal(
        np.asarray(rns.sub_mod(jnp.asarray(a), jnp.asarray(b), qj)).astype(object),
        (a.astype(object) - b) % q)
    assert np.array_equal(
        np.asarray(rns.neg_mod(jnp.asarray(a), qj)).astype(object),
        (-a.astype(object)) % q)


def test_garner_crt_centered():
    primes = tuple(rns.find_ntt_primes(28, 2 * 1024, 5))
    rng = np.random.default_rng(5)
    vals = rng.integers(-2 ** 45, 2 ** 45, 512).astype(object)
    res = np.zeros((5, 512), dtype=np.uint64)
    for i, q in enumerate(primes):
        res[i] = np.array([int(v) % q for v in vals], dtype=np.uint64)
    rec = rns.crt_to_centered_float(res, primes)
    assert np.allclose(rec, vals.astype(np.float64))
