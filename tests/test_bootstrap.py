"""CKKS bootstrap tests (slow: ~5 min on the 2-CPU CI host).

The reference delegates bootstrapping entirely to desilofhe
(/root/reference/xor_service.py:120-129); these tests exercise our from-
scratch ModRaise/CoeffToSlot/EvalMod/SlotToCoeff chain end to end.
"""
import numpy as np
import pytest

from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu.core.params import CKKSParams
from aesfhe_tpu.core.engine import Engine
from aesfhe_tpu.ops.zeta import ZetaEncoder


@pytest.fixture(scope="module")
def boot():
    import os
    eng = Engine(CKKSParams(n=1 << 9, max_level=34, scale_bits=27,
                            first_prime_bits=30, num_special_primes=4,
                            secret_hamming=16), use_bootstrap=True)
    cache = os.environ.get("AESFHE_KEY_CACHE")
    if cache:
        from aesfhe_tpu.utils.serialization import (cached_key_family,
                                                    cached_bootstrap_key)
        fam = cached_key_family(eng, cache, rotation_steps=())
        sk = fam["secret"]
        pk, rlk, conj = fam["public"], fam["relin"], fam["conj"]
        bk = cached_bootstrap_key(eng, sk, cache)
    else:
        sk = eng.create_secret_key()
        pk = eng.create_public_key(sk)
        rlk = eng.create_relinearization_key(sk)
        conj = eng.create_conjugation_key(sk)
        bk = eng.create_bootstrap_key(sk)
    return dict(eng=eng, sk=sk, pk=pk, rlk=rlk, conj=conj, bk=bk)


@pytest.mark.slow
def test_bootstrap_zeta16_roundtrip(boot):
    eng = boot["eng"]
    sc = eng.slot_count
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 16, sc, dtype=np.uint8)
    z = ZetaEncoder.to_zeta(vals, 16)
    ct = eng.encrypt(z, boot["pk"])
    low = eng._drop(ct, 0)           # exhausted ciphertext
    out = eng.bootstrap(low, boot["rlk"], boot["conj"], boot["bk"])
    assert out.level > 4, "bootstrap must return usable levels"
    dec = eng.decrypt(out, boot["sk"])
    assert np.max(np.abs(dec - z)) < 0.19
    assert np.array_equal(ZetaEncoder.from_zeta(dec, 16), vals)


@pytest.mark.slow
def test_bootstrap_then_compute(boot):
    # the refreshed ciphertext must support further homomorphic ops
    eng = boot["eng"]
    sc = eng.slot_count
    vals = np.arange(sc) % 16
    z = ZetaEncoder.to_zeta(vals, 16)
    ct = eng.encrypt(z, boot["pk"])
    out = eng.bootstrap(eng._drop(ct, 0), boot["rlk"], boot["conj"],
                        boot["bk"])
    sq = eng.multiply(out, out, boot["rlk"])
    dec = eng.decrypt(sq, boot["sk"])
    assert np.max(np.abs(dec - z * z)) < 0.4


@pytest.mark.slow
def test_bootstrap_pair_packed(boot):
    """Two REAL +-1 planes ride one complex bootstrap as p0 + i*p1 (exact
    zeta4 i-multiply), then unpack via conjugation — the refresh used by the
    bit-sliced AES pipeline (pipeline.AESFHE128Bitsliced._refresh)."""
    eng = boot["eng"]
    sc = eng.slot_count
    rng = np.random.default_rng(9)
    p0 = 1.0 - 2.0 * rng.integers(0, 2, sc).astype(np.float64)
    p1 = 1.0 - 2.0 * rng.integers(0, 2, sc).astype(np.float64)
    ct0 = eng.encrypt(p0, boot["pk"])
    ct1 = eng.encrypt(p1, boot["pk"])
    packed = eng.add(eng._drop(ct0, 0), eng.multiply_i(eng._drop(ct1, 0)))
    z = eng.bootstrap(packed, boot["rlk"], boot["conj"], boot["bk"])
    zc = eng.conjugate(z, boot["conj"])
    out0 = eng.linear_combination([z, zc], [0.5, 0.5])
    out1 = eng.linear_combination([z, zc], [-0.5j, 0.5j])
    assert out0.level > 3 and out1.level > 3
    d0 = eng.decrypt(out0, boot["sk"])
    d1 = eng.decrypt(out1, boot["sk"])
    # packing doubles the coefficient amplitude; allow a looser bound than
    # the single-plane 0.19 but require correct signs everywhere
    assert np.max(np.abs(d0 - p0)) < 0.35
    assert np.max(np.abs(d1 - p1)) < 0.35
    assert np.array_equal(np.real(d0) < 0, p0 < 0)
    assert np.array_equal(np.real(d1) < 0, p1 < 0)


def test_pow2_hops():
    """Signed power-of-two giant decomposition: every gamma in a realistic
    BSGS range resolves to a minimal hop chain that sums back exactly."""
    from aesfhe_tpu.bootstrap import _pow2_hops
    assert _pow2_hops(0) == []
    for gamma in range(-16, 17):
        hops = _pow2_hops(gamma)
        assert sum(hops) == gamma
        assert all(h and (abs(h) & (abs(h) - 1)) == 0 for h in hops)
        # chain is short: composite gammas cost at most 2 extra hops here
        assert len(hops) <= 3


def test_giant_steps_are_pow2_multiples():
    """Plan giant steps only ever reference +-g*B*2^k (composite gammas ride
    hop chains instead of dedicated switch keys -- each dropped key is
    ~231 MB of HBM at prod_boot)."""
    from aesfhe_tpu import bootstrap as bs
    p = CKKSParams(n=1 << 9, max_level=4, scale_bits=25, first_prime_bits=28,
                   num_special_primes=3, secret_hamming=16)
    sc = p.slot_count
    stc_plan, cts_plan = bs.build_factored_plans(p)
    for pl in stc_plan + cts_plan:
        stride = pl["g"] * pl["B"]
        for s in pl["giant_steps"]:
            if s % sc == 0:
                continue
            m = s if abs(s) <= sc // 2 else s - sc * (1 if s > 0 else -1)
            assert m % stride == 0
            k = abs(m) // stride
            assert k & (k - 1) == 0, f"giant step {s} is not pow2*stride"


def test_factored_plans_match_dense():
    """Factored FFT-stage plans reproduce the dense decode/encode matrices
    exactly (host-side linear algebra; no FHE)."""
    from aesfhe_tpu import bootstrap as bs
    from aesfhe_tpu.core.ntt import bit_reverse_perm
    p = CKKSParams(n=1 << 9, max_level=4, scale_bits=25, first_prime_bits=28,
                   num_special_primes=3, secret_hamming=16)
    sc, n, two_n = p.slot_count, p.n, 2 * p.n
    E = np.exp(1j * np.pi * (np.outer(p.slot_exp, np.arange(sc)) % two_n) / n)
    br = bit_reverse_perm(sc)
    stc_plan, cts_plan = bs.build_factored_plans(p)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(sc) + 1j * rng.standard_normal(sc)

    def apply_plan(plan, v):
        out = np.zeros_like(v)
        for ent in plan["entries"]:
            out += ent["u"] * np.roll(v, -ent["delta"])
        return out

    y = x.copy()
    for plan in stc_plan:
        y = apply_plan(plan, y)
    assert np.allclose(y, E[:, br] @ x), "STC chain != E*BR"
    y2 = x.copy()
    for plan in cts_plan:
        y2 = apply_plan(plan, y2)
    assert np.allclose(y2, np.conj(E[:, br]).T @ x / n), "CTS chain != F"
    # BSGS offset decomposition is consistent and granular
    for pl in stc_plan + cts_plan:
        for ent in pl["entries"]:
            assert (pl["g"] * (ent["beta"] + pl["B"] * ent["gamma"])) % sc \
                == ent["delta"] % sc


@pytest.mark.slow
def test_fused_bootstrap_bit_exact(boot):
    """FusedBootstrap (whole bootstrap as ONE jitted program, keys and
    diagonal stacks as args) must be bit-identical to the eager per-op
    path and reusable across calls."""
    import jax
    from aesfhe_tpu import bootstrap as bs
    eng, sk, pk, rlk, conj, bk = (boot[k] for k in
                                  ("eng", "sk", "pk", "rlk", "conj", "bk"))
    sc = eng.params.slot_count
    z = ZetaEncoder.to_zeta(
        np.random.default_rng(7).integers(0, 16, sc, dtype=np.uint8), 16)
    low = eng._drop(eng.encrypt(z, pk), 0)
    fused = bs.FusedBootstrap(eng, rlk, conj, bk, low)
    out = fused(low)
    jax.block_until_ready(out.data)
    # bit-identical to the EAGER per-op path (the capture itself is now
    # abstract -- jax.eval_shape -- so the oracle is a real eager run)
    want = bs.bootstrap(eng, low, rlk, conj, bk)
    assert np.array_equal(np.asarray(out.data), np.asarray(want.data))
    assert out.scale == want.scale
    # decodes correctly and to the same values as the eager result
    err = np.max(np.abs(eng.decrypt(out, sk) - z))
    assert err < 0.1
