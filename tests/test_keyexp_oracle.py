"""Key schedule + plain oracle sanity against the FIPS-197 known-answer
vector (host-side components; no FHE)."""
import numpy as np

from aesfhe_tpu.keyexp import expand_key_128
from aesfhe_tpu.utils.aes_utils import (bytes_to_state, state_to_bytes,
                                        pkcs7_pad, pkcs7_unpad, chunk_bytes)
from tests.aes_oracle import aes128_encrypt_block, shift_rows, mix_columns, \
    inv_shift_rows, inv_mix_columns


def test_fips197_key_expansion():
    key = bytes(range(16))
    rks = expand_key_128(key)
    # FIPS-197 Appendix A.1 for key 2b7e151628aed2a6abf7158809cf4f3c
    rks2 = expand_key_128(bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"))
    assert rks.shape == (11, 16)
    assert rks2[1].tobytes().hex() == "a0fafe1788542cb123a339392a6c7605"
    assert rks2[10].tobytes().hex() == "d014f9a8c9ee2589e13f0cc8b6630ca6"


def test_fips197_known_answer():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = np.frombuffer(bytes.fromhex("00112233445566778899aabbccddeeff"),
                       dtype=np.uint8)
    ct = aes128_encrypt_block(pt, key)
    assert ct.tobytes().hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_shift_mix_inverses():
    rng = np.random.default_rng(0)
    s = rng.integers(0, 256, 16, dtype=np.uint8)
    assert np.array_equal(inv_shift_rows(shift_rows(s)), s)
    assert np.array_equal(inv_mix_columns(mix_columns(s)), s)


def test_state_layout_roundtrip():
    # /root/reference/test/test_utils.py intent
    blk = bytes(range(16))
    st = bytes_to_state(blk)
    assert st[0, 0] == 0 and st[1, 0] == 1 and st[0, 1] == 4
    assert state_to_bytes(st) == blk


def test_pkcs7():
    for n in (0, 1, 15, 16, 17):
        data = bytes(range(n % 256))[:n]
        assert pkcs7_unpad(pkcs7_pad(data)) == data
    assert len(pkcs7_pad(b"x" * 16)) == 32
    assert chunk_bytes(b"a" * 33) == [b"a" * 16, b"a" * 16, b"a"]
