"""SubBytes tests: port of /root/reference/test/test_sbox_service.py
(coefficient sanity + exhaustive S-box check; the reference's 256 one-at-a-
time circuits become one SIMD ciphertext)."""
import numpy as np
import pytest

from aesfhe_tpu.ops.sbox_service import SBoxService, AES_SBOX, load_json_coeffs
from aesfhe_tpu.ops.xor_service import EngineWrapper
from aesfhe_tpu.ops.zeta import ZetaEncoder
from aesfhe_tpu.coeffs.generate import COEFF_DIR


@pytest.fixture(scope="module")
def sbox_svc(hp_engine):
    from tests.test_xor_service import _CtxShim
    return SBoxService(EngineWrapper(ctx=_CtxShim(hp_engine)))


def test_coeff_files_reconstruct_sbox():
    # /root/reference/test/test_sbox_service.py:27-42: the hi/lo LUT
    # polynomials evaluated at zeta256^x must reproduce the S-box
    hi = load_json_coeffs(COEFF_DIR / "sbox_hi_coeffs.json")
    lo = load_json_coeffs(COEFF_DIR / "sbox_lo_coeffs.json")
    assert len(hi) == 256 and len(lo) == 256
    zeta = np.exp(-2j * np.pi / 256)
    x = np.arange(256)
    pts = zeta ** x
    vand = pts[:, None] ** np.arange(256)[None, :]
    vh = vand @ hi
    vl = vand @ lo
    combined = vh * vl      # zeta256^(16*hi + lo) = zeta256^SBOX[x]
    out = ZetaEncoder.from_zeta(combined, 256)
    assert np.array_equal(out, AES_SBOX)


@pytest.mark.slow
def test_sub_bytes_array_all_bytes(sbox_svc, hp_engine):
    # exhaustive: all 256 inputs in one SIMD ciphertext
    # (/root/reference/test/test_sbox_service.py:55-66)
    E = hp_engine
    vals = np.arange(256, dtype=np.uint8)
    enc = E["eng"].encrypt(ZetaEncoder.to_zeta(vals, 256), E["pk"])
    out_ct = sbox_svc.sub_bytes_array(enc)
    dec = E["eng"].decrypt(out_ct, E["sk"])
    out = ZetaEncoder.from_zeta(dec, 256)[:256]
    assert np.array_equal(out, AES_SBOX)


def test_sub_bytes_bsgs_matches(sbox_svc, hp_engine):
    E = hp_engine
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 256, size=64, dtype=np.uint8)
    enc = E["eng"].encrypt(ZetaEncoder.to_zeta(vals, 256), E["pk"])
    out_ct = sbox_svc.sub_bytes_array_bsgs(enc)
    out = ZetaEncoder.from_zeta(E["eng"].decrypt(out_ct, E["sk"]), 256)[:64]
    assert np.array_equal(out, AES_SBOX[vals])
