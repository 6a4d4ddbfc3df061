"""ShiftRows tests: port of /root/reference/test/test_shiftrows.py (plain
oracle + inverse round-trip) plus the SIMD multi-block variant the reference
lacks."""
import numpy as np
import pytest

from aesfhe_tpu.ops.shiftrows_service import AESFHEShiftRows
from aesfhe_tpu.ops.xor_service import EngineWrapper
from aesfhe_tpu.ops.zeta import ZetaEncoder


def shift_rows_ref(state16: np.ndarray) -> np.ndarray:
    """Plain column-major ShiftRows oracle
    (/root/reference/test/test_shift_mix_fhe.py:12-41)."""
    s = state16.reshape(4, 4, order="F").copy()
    for r in range(1, 4):
        s[r] = np.roll(s[r], -r)
    return s.reshape(16, order="F")


@pytest.fixture(scope="module")
def sr(tiny_engine):
    from tests.test_xor_service import _CtxShim
    return AESFHEShiftRows(EngineWrapper(ctx=_CtxShim(tiny_engine)))


def test_shift_rows_single_block(sr, tiny_engine):
    E = tiny_engine
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, 16, dtype=np.uint8)
    enc = E["eng"].encrypt(ZetaEncoder.to_zeta(state, 256), E["pk"])
    out = ZetaEncoder.from_zeta(E["eng"].decrypt(sr.shift_rows(enc),
                                                 E["sk"]), 256)[:16]
    assert np.array_equal(out, shift_rows_ref(state))


def test_inverse_roundtrip_single_block(sr, tiny_engine):
    # /root/reference/test/test_shiftrows.py:36-71 intent
    E = tiny_engine
    rng = np.random.default_rng(1)
    state = rng.integers(0, 256, 16, dtype=np.uint8)
    enc = E["eng"].encrypt(ZetaEncoder.to_zeta(state, 256), E["pk"])
    rt = sr.inverse_shift_rows(sr.shift_rows(enc))
    out = ZetaEncoder.from_zeta(E["eng"].decrypt(rt, E["sk"]), 256)[:16]
    assert np.array_equal(out, state)


def test_shift_rows_simd_multiblock(sr, tiny_engine):
    E = tiny_engine
    sc = E["eng"].slot_count
    nblocks = sc // 16
    rng = np.random.default_rng(2)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    enc = E["eng"].encrypt(ZetaEncoder.to_zeta(state, 256), E["pk"])
    out = ZetaEncoder.from_zeta(E["eng"].decrypt(sr.shift_rows_simd(enc),
                                                 E["sk"]), 256)
    ref = np.concatenate([shift_rows_ref(state[16 * b:16 * b + 16])
                          for b in range(nblocks)])
    assert np.array_equal(out[:16 * nblocks], ref)


def test_shift_rows_simd_inverse_roundtrip(sr, tiny_engine):
    E = tiny_engine
    sc = E["eng"].slot_count
    rng = np.random.default_rng(3)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    enc = E["eng"].encrypt(ZetaEncoder.to_zeta(state, 256), E["pk"])
    rt = sr.shift_rows_simd(sr.shift_rows_simd(enc), inverse=True)
    out = ZetaEncoder.from_zeta(E["eng"].decrypt(rt, E["sk"]), 256)
    assert np.array_equal(out, state)
