"""Merged ShiftRows+MixColumns tests: the intents of
/root/reference/test/test_shift_mix_fhe.py, test_merged_shift_mix_transformer.py,
test_mixcolumns*.py (plain oracle comparison, SIMD, inverse round-trip)."""
import numpy as np
import pytest

from aesfhe_tpu.ops.xor_service import EngineWrapper, XORService
from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer, NibblePair
from aesfhe_tpu.ops.zeta import ZetaEncoder, split_nibbles
from aesfhe_tpu.core.params import get_params
from aesfhe_tpu.core.engine import Engine
from tests.aes_oracle import shift_rows, mix_columns, inv_shift_rows, \
    inv_mix_columns


@pytest.fixture(scope="module")
def deep(deep_engine):
    from tests.test_xor_service import _CtxShim
    E = deep_engine
    wrap = EngineWrapper(ctx=_CtxShim(E))
    xor_svc = XORService(wrap)
    tf = AESFHETransformer(wrap, xor_svc)
    return dict(E=E, wrap=wrap, xor=xor_svc, tf=tf)


def _encrypt_pairs(deep, state):
    hi, lo = split_nibbles(state)
    return NibblePair(deep["wrap"].encrypt(ZetaEncoder.to_zeta(hi, 16)),
                      deep["wrap"].encrypt(ZetaEncoder.to_zeta(lo, 16)))


def _decrypt_pairs(deep, pair, n):
    hi = ZetaEncoder.from_zeta(deep["wrap"].decrypt(pair.hi), 16)[:n]
    lo = ZetaEncoder.from_zeta(deep["wrap"].decrypt(pair.lo), 16)[:n]
    return (hi.astype(np.uint8) << 4) | lo


def _oracle_blocks(state, fn):
    out = np.zeros_like(state)
    for b in range(0, len(state), 16):
        out[b:b + 16] = fn(state[b:b + 16])
    return out


def test_merged_shift_mix_simd(deep):
    sc = deep["wrap"].engine.slot_count
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    pair = _encrypt_pairs(deep, state)
    out_pair = deep["tf"].merged_shift_mix_pairs(pair)
    got = _decrypt_pairs(deep, out_pair, sc)
    want = _oracle_blocks(state, lambda s: mix_columns(shift_rows(s)))
    assert np.array_equal(got, want)


@pytest.mark.slow
def test_merged_inverse_roundtrip(deep):
    sc = deep["wrap"].engine.slot_count
    rng = np.random.default_rng(1)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    pair = _encrypt_pairs(deep, state)
    inv_pair = deep["tf"].merged_shift_mix_pairs(pair, inverse=True)
    got = _decrypt_pairs(deep, inv_pair, sc)
    want = _oracle_blocks(state, lambda s: inv_shift_rows(inv_mix_columns(s)))
    assert np.array_equal(got, want)
