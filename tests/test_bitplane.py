"""Bit-sliced (Walsh-basis) pipeline tests against the FIPS-197 oracle.

This pipeline is this framework's beyond-parity design: the reference has
only the zeta LUT path (and never finished even that -- its round driver
stops at AddRoundKey, /root/reference/new.py:186-227)."""
import numpy as np
import pytest

from aesfhe_tpu.ops.xor_service import EngineWrapper
from aesfhe_tpu.ops.bitplane import (BitSliceService, walsh_tables,
                                     chi_signs, mul_bits, gmul,
                                     AES_INV_SBOX)
from aesfhe_tpu.coeffs.generate import AES_SBOX
from aesfhe_tpu.keyexp import expand_key_128
from tests.aes_oracle import (aes128_partial, shift_rows as oracle_sr,
                              mix_columns as oracle_mix)

KEY = bytes.fromhex("000102030405060708090a0b0c0d0e0f")


# -- host math ---------------------------------------------------------------

def test_walsh_reconstruction():
    x = np.arange(256)
    par = ((x[:, None] & x[None, :]) != 0)  # placeholder; use popcount below
    chi = np.array([[1 - 2 * (bin(u & xi).count("1") & 1)
                     for xi in range(256)] for u in range(256)])
    for table in (AES_SBOX, AES_INV_SBOX):
        W = walsh_tables(table)
        for k in range(8):
            f = 1.0 - 2.0 * ((table[x].astype(int) >> k) & 1)
            assert np.allclose(W[k] @ chi, f)


def test_chi_key_factorization():
    rng = np.random.default_rng(0)
    rk = rng.integers(0, 256, 64, dtype=np.uint8)
    xs = rng.integers(0, 256, 64, dtype=np.uint8)
    for u in (1, 37, 200, 255):
        assert np.array_equal(chi_signs(u, xs ^ rk),
                              chi_signs(u, xs) * chi_signs(u, rk))


def test_mul_bits_linearity():
    rng = np.random.default_rng(1)
    for m in (1, 2, 3, 9, 11, 13, 14):
        for k in range(8):
            bits = mul_bits(m, k)
            for xv in rng.integers(0, 256, 16):
                want = (gmul(m, int(xv)) >> k) & 1
                got = 0
                for kp in bits:
                    got ^= (int(xv) >> kp) & 1
                assert got == want


# -- homomorphic -------------------------------------------------------------

@pytest.fixture(scope="module")
def bit_env(deep_engine):
    from tests.test_xor_service import _CtxShim
    wrap = EngineWrapper(ctx=_CtxShim(deep_engine))
    svc = BitSliceService(wrap)
    sc = wrap.engine.slot_count
    rng = np.random.default_rng(7)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    return wrap, svc, state


def test_encode_roundtrip(bit_env):
    wrap, svc, state = bit_env
    st = svc.encrypt_state(state)
    assert np.array_equal(svc.decrypt_state(st), state)


def test_xor_plain(bit_env):
    wrap, svc, state = bit_env
    key = np.frombuffer(KEY, dtype=np.uint8)
    st = svc.xor_plain(svc.encrypt_state(state), key)
    sc = wrap.engine.slot_count
    assert np.array_equal(svc.decrypt_state(st),
                          state ^ np.tile(key, sc // 16))


def test_sub_bytes_with_key_fold(bit_env):
    wrap, svc, state = bit_env
    key = np.frombuffer(KEY, dtype=np.uint8)
    sc = wrap.engine.slot_count
    st_in = svc.encrypt_state(state)
    out = svc.sub_bytes(st_in, round_key=key)
    want = AES_SBOX[state ^ np.tile(key, sc // 16)]
    assert np.array_equal(svc.decrypt_state(out), want)
    # 4 levels: depth-2 character bases + tensor + fused combine
    assert st_in.level - out.level == 4


def test_inv_sub_bytes(bit_env):
    wrap, svc, state = bit_env
    st = svc.sub_bytes(svc.encrypt_state(state), inverse=True)
    assert np.array_equal(svc.decrypt_state(st), AES_INV_SBOX[state])


def test_shift_mix_vs_oracle(bit_env):
    wrap, svc, state = bit_env
    sc = wrap.engine.slot_count
    st = svc.mix_columns(svc.shift_rows(svc.encrypt_state(state)))
    want = np.concatenate([
        oracle_mix(oracle_sr(state[b:b + 16])) for b in range(0, sc, 16)])
    assert np.array_equal(svc.decrypt_state(st), want)


def test_inverse_roundtrip(bit_env):
    wrap, svc, state = bit_env
    st = svc.mix_columns(svc.shift_rows(svc.encrypt_state(state)))
    st = svc.cleanse(st)
    st = svc.shift_rows(svc.mix_columns(st, inverse=True), inverse=True)
    assert np.array_equal(svc.decrypt_state(st), state)


def test_two_rounds_vs_fips(bit_env):
    wrap, svc, state = bit_env
    sc = wrap.engine.slot_count
    from aesfhe_tpu.pipeline import AESFHE128Bitsliced
    aes = AESFHE128Bitsliced(wrap, KEY)
    out = aes.encrypt_rounds(aes.encrypt_state(state), rounds=2)
    got = aes.decrypt_state(out)
    want = np.concatenate([aes128_partial(state[b:b + 16], KEY, rounds=2)
                           for b in range(0, sc, 16)])
    assert np.array_equal(got, want)


def test_checkpoint_resume(bit_env, tmp_path):
    """encrypt_rounds(2) resumed from a round-1 checkpoint equals a straight
    2-round run (the per-round checkpoint/resume the reference lacks,
    SURVEY.md section 5)."""
    wrap, svc, state = bit_env
    from aesfhe_tpu.pipeline import AESFHE128Bitsliced
    aes = AESFHE128Bitsliced(wrap, KEY)
    ck = str(tmp_path / "ckpt")
    st0 = aes.encrypt_state(state)
    aes.encrypt_rounds(st0, rounds=1, checkpoint_dir=ck)
    resumed = aes.encrypt_rounds(st0, rounds=2, checkpoint_dir=ck)
    direct = aes.encrypt_rounds(st0, rounds=2)
    assert np.array_equal(aes.decrypt_state(resumed),
                          aes.decrypt_state(direct))


@pytest.mark.big
def test_full_aes128_bitsliced_fips197():
    """All 10 rounds on the bit-sliced pipeline with real CKKS bootstrap
    refreshes: FIPS-197 appendix C.1 vector, SIMD-tiled across all slots.
    One refresh sustains a full 13-level round on the boot_tiny chain."""
    from aesfhe_tpu.ops.xor_service import XORConfig
    from aesfhe_tpu.pipeline import AESFHE128Bitsliced
    cfg = XORConfig(profile="boot_tiny", use_bootstrap=True)
    wrap = EngineWrapper(cfg)
    aes = AESFHE128Bitsliced(wrap, KEY, refresh=wrap.bootstrap)
    sc = wrap.engine.slot_count
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    want_ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    state = np.tile(np.frombuffer(pt, dtype=np.uint8), sc // 16)
    out = aes.encrypt_rounds(aes.encrypt_state(state), rounds=10)
    got = aes.decrypt_state(out)
    want = np.tile(np.frombuffer(want_ct, dtype=np.uint8), sc // 16)
    assert np.array_equal(got, want)


def test_inverse_cipher_round(bit_env):
    wrap, svc, state = bit_env
    sc = wrap.engine.slot_count
    from aesfhe_tpu.pipeline import AESFHE128Bitsliced
    aes = AESFHE128Bitsliced(wrap, KEY)
    fwd = aes.encrypt_rounds(aes.encrypt_state(state), rounds=1)
    back = aes.decrypt_rounds(fwd, rounds=1)
    assert np.array_equal(aes.decrypt_state(back), state)
