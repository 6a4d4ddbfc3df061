"""GF(2^8) multiplier tests: port of /root/reference/test/test_total.py
intents plus the inverse-MixColumns multipliers the reference promises but
never ships (/root/reference/gf_service.py:24-26)."""
import numpy as np
import pytest

from aesfhe_tpu.ops.gf_service import GFService
from aesfhe_tpu.ops.xor_service import EngineWrapper
from aesfhe_tpu.ops.zeta import ZetaEncoder
from aesfhe_tpu.coeffs.generate import gf_table


@pytest.fixture(scope="module")
def gf_svc(hp_engine):
    from tests.test_xor_service import _CtxShim
    return GFService(EngineWrapper(ctx=_CtxShim(hp_engine)))


def _roundtrip(gf_svc, hp_engine, m):
    E = hp_engine
    vals = np.arange(256, dtype=np.uint8)
    enc = E["eng"].encrypt(ZetaEncoder.to_zeta(vals, 256), E["pk"])
    out_ct = gf_svc.mul_byte(enc, m)
    out = ZetaEncoder.from_zeta(E["eng"].decrypt(out_ct, E["sk"]), 256)[:256]
    assert np.array_equal(out, gf_table(m)), f"gf x{m}"


def test_mul2_all_bytes(gf_svc, hp_engine):
    _roundtrip(gf_svc, hp_engine, 2)


def test_mul3_all_bytes(gf_svc, hp_engine):
    _roundtrip(gf_svc, hp_engine, 3)


@pytest.mark.slow
@pytest.mark.parametrize("m", [9, 11, 13, 14])
def test_inverse_multipliers(gf_svc, hp_engine, m):
    _roundtrip(gf_svc, hp_engine, m)


def test_hi_lo_pair_decode(gf_svc, hp_engine):
    # mul2 returns (zeta16^hi, zeta256^lo) per the 8->4 LUT convention
    E = hp_engine
    vals = np.arange(256, dtype=np.uint8)
    enc = E["eng"].encrypt(ZetaEncoder.to_zeta(vals, 256), E["pk"])
    hi_ct, lo_ct = gf_svc.mul2(enc)
    hi = ZetaEncoder.from_zeta(E["eng"].decrypt(hi_ct, E["sk"]), 16)[:256]
    lo = ZetaEncoder.from_zeta(E["eng"].decrypt(lo_ct, E["sk"]), 256)[:256]
    t = gf_table(2)
    assert np.array_equal(hi, t >> 4)
    assert np.array_equal(lo, t & 0xF)
