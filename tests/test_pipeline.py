"""Full-pipeline tests: one homomorphic AES round against the FIPS-197
oracle (partial rounds until bootstrap lands; the reference never reaches
this point at all -- its round driver stops at AddRoundKey,
/root/reference/new.py:186-227)."""
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
