"""Full-pipeline tests: one homomorphic AES round against the FIPS-197
oracle (partial rounds until bootstrap lands; the reference never reaches
this point at all -- its round driver stops at AddRoundKey,
/root/reference/new.py:186-227)."""
import os

import numpy as np
import pytest

from aesfhe_tpu.pipeline import AESFHE128
from aesfhe_tpu.ops.xor_service import EngineWrapper, XORService
from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer
from aesfhe_tpu.ops.shiftrows_service import AESFHEShiftRows
from aesfhe_tpu.keyexp import expand_key_128
from tests.aes_oracle import aes128_partial


@pytest.fixture(scope="module")
def cipher(deep_engine):
    from tests.test_xor_service import _CtxShim
    wrap = EngineWrapper(ctx=_CtxShim(deep_engine))
    xor_svc = XORService(wrap)
    tf = AESFHETransformer(wrap, xor_svc)
    sr = AESFHEShiftRows(wrap, xor_svc)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    return AESFHE128(wrap, xor_svc, tf, sr, key), wrap


def test_one_full_round(cipher):
    aes, wrap = cipher
    sc = wrap.engine.slot_count
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    pair = aes.encrypt_state(state)
    out_pair = aes.encrypt_rounds(pair, rounds=1)
    got = aes.decrypt_state(out_pair)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    want = np.concatenate([
        aes128_partial(state[b:b + 16], key, rounds=1)
        for b in range(0, sc, 16)])
    assert np.array_equal(got, want)


def test_pack_blocks_roundtrip(cipher):
    aes, wrap = cipher
    data = bytes(range(48))
    flat, nblocks = aes.pack_blocks(data)
    assert nblocks == 4   # 48 bytes + 16 bytes PKCS#7 pad
    assert bytes(flat[:48]) == data
    assert flat[48:64].tolist() == [16] * 16


@pytest.fixture(scope="module")
def boot_cipher():
    """Bootstrap-capable cipher: refresh = engine bootstrap between rounds
    (the reference's level<8 trigger generalized; it could never run more
    than AddRoundKey, /root/reference/new.py:186-227)."""
    from aesfhe_tpu.ops.xor_service import XORConfig
    cfg = XORConfig(profile="boot_tiny", use_bootstrap=True)
    wrap = EngineWrapper(cfg)
    xor_svc = XORService(wrap)
    tf = AESFHETransformer(wrap, xor_svc)
    sr = AESFHEShiftRows(wrap, xor_svc)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    aes = AESFHE128(wrap, xor_svc, tf, sr, key, refresh=wrap.bootstrap)
    return aes, wrap


@pytest.mark.big
def test_three_rounds_with_bootstrap(boot_cipher):
    """3 AES rounds crossing at least one bootstrap refresh, vs the oracle."""
    aes, wrap = boot_cipher
    sc = wrap.engine.slot_count
    rng = np.random.default_rng(7)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    pair = aes.encrypt_state(state)
    out_pair = aes.encrypt_rounds(pair, rounds=3)
    got = aes.decrypt_state(out_pair)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    want = np.concatenate([
        aes128_partial(state[b:b + 16], key, rounds=3)
        for b in range(0, sc, 16)])
    assert np.array_equal(got, want)


@pytest.mark.big
def test_full_aes128_fips197(boot_cipher):
    """All 10 rounds: FIPS-197 appendix C.1 known-answer vector, SIMD-tiled
    across every block slot."""
    aes, wrap = boot_cipher
    sc = wrap.engine.slot_count
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    want_ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    state = np.tile(np.frombuffer(pt, dtype=np.uint8), sc // 16)
    pair = aes.encrypt_state(state)
    out_pair = aes.encrypt_rounds(pair, rounds=10)
    got = aes.decrypt_state(out_pair)
    want = np.tile(np.frombuffer(want_ct, dtype=np.uint8), sc // 16)
    assert np.array_equal(got, want)


@pytest.fixture(scope="module")
def prod_shaped_cipher():
    """Production-SHAPED zeta cipher: the exact prod_boot chain structure
    (54 levels, scale 2^27, 8 specials, h=192, hi_prec paired-prime
    bootstrap) on a small ring (n=2^10) -- the same depth/noise shape the
    round-3 full-ring forensics used (PERF.md), NOT the boot_tiny toy
    chain.  The post-refresh budget (~20 levels) cannot hold any 14-23
    level round segment, so segment-refresh scheduling is required
    (DESIGN_NOTES "zeta-at-production depth wall")."""
    from aesfhe_tpu.core.params import CKKSParams
    from aesfhe_tpu.core.engine import Engine
    from aesfhe_tpu.core import keys as keys_mod
    from aesfhe_tpu import bootstrap as bs

    keys_mod.seed_keygen(0)
    params = CKKSParams(n=1 << 10, max_level=54, scale_bits=27,
                        num_special_primes=8, secret_hamming=192)
    eng = Engine(params, use_bootstrap=True)
    cache = os.environ.get("AESFHE_KEY_CACHE")
    if cache:
        from aesfhe_tpu.utils.serialization import (cached_key_family,
                                                    cached_bootstrap_key)
        fam = cached_key_family(eng, cache)
        sk = fam["secret"]
        _pk, _rlk, _conj, _rot = (fam["public"], fam["relin"], fam["conj"],
                                  fam["rotation"])
        _bk = cached_bootstrap_key(eng, sk, cache, hi_prec=True)
    else:
        sk = eng.create_secret_key()
        _pk = eng.create_public_key(sk)
        _rlk = eng.create_relinearization_key(sk)
        _conj = eng.create_conjugation_key(sk)
        _rot = eng.create_rotation_key(sk)
        _bk = bs.create_bootstrap_key(eng, sk, hi_prec=True)

    class _Shim:
        engine = eng
        secret_key = sk
        public_key = _pk
        relinearization_key = _rlk
        conjugation_key = _conj
        rotation_key = _rot
        # hi_prec forced: the n>=4096 heuristic would pick the single-prime
        # path on this small ring, but the chain is prod-shaped (ADVICE r3:
        # the override exists exactly for this)
        bootstrap_key = _bk
        small_bootstrap_key = None

    wrap = EngineWrapper(ctx=_Shim())
    xor_svc = XORService(wrap)
    tf = AESFHETransformer(wrap, xor_svc)
    sr = AESFHEShiftRows(wrap, xor_svc)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    aes = AESFHE128(wrap, xor_svc, tf, sr, key, refresh=wrap.bootstrap)
    aes.segment_refresh = True
    # prod-shaped hi_prec refreshes land at ~1e-3 error; two cleanses reach
    # the 2-cleanse fixed point (DESIGN_NOTES) and the budget holds exactly
    aes.post_boot_cleanses = 2
    return aes, wrap


@pytest.mark.big
def test_zeta_three_rounds_prod_shaped(prod_shaped_cipher):
    """VERDICT r3 #5: 3 zeta rounds on a prod-shaped chain (not boot_tiny),
    exact vs the FIPS oracle, crossing ~70 segment refreshes."""
    aes, wrap = prod_shaped_cipher
    sc = wrap.engine.slot_count
    rng = np.random.default_rng(11)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    pair = aes.encrypt_state(state)
    out_pair = aes.encrypt_rounds(pair, rounds=3)
    got = aes.decrypt_state(out_pair)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    want = np.concatenate([
        aes128_partial(state[b:b + 16], key, rounds=3)
        for b in range(0, sc, 16)])
    assert np.array_equal(got, want)
