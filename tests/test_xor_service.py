"""XOR service tests: port of /root/reference/test/test_xor_service.py and
test/test_new_xor.py intents (with the broken-fixture API repaired, see
SURVEY.md section 4).

The reference brute-forces all 16x16 nibble pairs one ciphertext at a time
(test_xor_service.py:106-123); here the 256 pairs are packed into ONE SIMD
ciphertext -- same coverage, one circuit evaluation.
"""
import numpy as np
import pytest

from aesfhe_tpu.ops.xor_service import (XORConfig, EngineWrapper,
                                        CoefficientCache, FullXORCache,
                                        XORService)
from aesfhe_tpu.ops.zeta import ZetaEncoder


@pytest.fixture(scope="module")
def xor_svc(test_engine):
    eng = EngineWrapper(ctx=_CtxShim(test_engine))
    cfg = XORConfig()
    return XORService(
        eng,
        coeff_cache=CoefficientCache(cfg.coeffs_path),
        nibble_hi_cache=CoefficientCache(cfg.nibble_hi_path),
        nibble_lo_cache=CoefficientCache(cfg.nibble_lo_path),
        full_xor_cache=FullXORCache(cfg.mul_coeffs_path),
    )


class _CtxShim:
    """Adapts the shared test-engine fixture dict to the EngineContext shape."""

    def __init__(self, E):
        self.engine = E["eng"]
        self.secret_key = E["sk"]
        self.public_key = E["pk"]
        self.relinearization_key = E["rlk"]
        self.conjugation_key = E["conj"]
        self.rotation_key = E["rot"]
        self.bootstrap_key = None


def test_xor_simple(xor_svc):
    a = np.array([0, 1, 2, 3], dtype=np.uint8)
    b = np.array([3, 2, 1, 0], dtype=np.uint8)
    assert np.array_equal(xor_svc.xor(a, b), a ^ b)


def test_xor_random_full_slots(xor_svc):
    sc = xor_svc.eng.engine.slot_count
    rng = np.random.default_rng(0)
    a = rng.integers(0, 16, size=sc, dtype=np.uint8)
    b = rng.integers(0, 16, size=sc, dtype=np.uint8)
    assert np.array_equal(xor_svc.xor(a, b), a ^ b)


def test_nibble_xor_bruteforce_simd(xor_svc):
    # all 256 (i, j) pairs in one ciphertext
    pairs = np.array([(i, j) for i in range(16) for j in range(16)],
                     dtype=np.uint8)
    out = xor_svc.xor(pairs[:, 0], pairs[:, 1])
    assert np.array_equal(out, pairs[:, 0] ^ pairs[:, 1])


def test_extract_nibbles(xor_svc):
    # /root/reference/test/test_xor_service.py:126-136
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 256, size=64, dtype=np.uint8)
    enc = xor_svc.eng.encrypt(ZetaEncoder.to_zeta(vals, 256))
    hi_ct, lo_ct = xor_svc.extract_nibbles(enc)
    hi = ZetaEncoder.from_zeta(xor_svc.eng.decrypt(hi_ct), 16)[:64]
    lo = ZetaEncoder.from_zeta(xor_svc.eng.decrypt(lo_ct), 16)[:64]
    assert np.array_equal(hi, vals // 16)
    assert np.array_equal(lo, vals % 16)


def test_lift_lo_roundtrip(xor_svc):
    vals = np.arange(16, dtype=np.uint8)
    enc16 = xor_svc.eng.encrypt(ZetaEncoder.to_zeta(vals, 16))
    lifted = xor_svc.lift_lo(enc16)
    out = ZetaEncoder.from_zeta(xor_svc.eng.decrypt(lifted), 256)[:16]
    assert np.array_equal(out, vals)


def test_recombine_nibbles16(xor_svc):
    rng = np.random.default_rng(2)
    vals = rng.integers(0, 256, size=32, dtype=np.uint8)
    hi = (vals >> 4).astype(np.uint8)
    lo = (vals & 0xF).astype(np.uint8)
    ct_hi = xor_svc.eng.encrypt(ZetaEncoder.to_zeta(hi, 16))
    ct_lo = xor_svc.eng.encrypt(ZetaEncoder.to_zeta(lo, 16))
    byte_ct = xor_svc.recombine_nibbles16(ct_hi, ct_lo)
    out = ZetaEncoder.from_zeta(xor_svc.eng.decrypt(byte_ct), 256)[:32]
    assert np.array_equal(out, vals)


@pytest.fixture(scope="module")
def xor_svc_hp(hp_engine):
    eng = EngineWrapper(ctx=_CtxShim(hp_engine))
    return XORService(eng)


@pytest.mark.slow
def test_xor256_small(xor_svc_hp):
    xor_svc = xor_svc_hp
    # 8-bit XOR via the 256x256 LUT -- the op that SIGKILLs the reference on
    # CPU (/root/reference/test/test_xor_service.py:89)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=16, dtype=np.uint8)
    b = rng.integers(0, 256, size=16, dtype=np.uint8)
    assert np.array_equal(xor_svc.xor256(a, b), a ^ b)
