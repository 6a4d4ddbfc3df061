"""Auxiliary subsystem tests: serialization (checkpoint/resume), hoisted
rotations, noise cleanse, op counters -- SURVEY.md section 5 equivalents."""
import numpy as np
import pytest

from aesfhe_tpu.core.ciphertext import Ciphertext
from aesfhe_tpu.utils.serialization import (save_ciphertext, load_ciphertext,
                                            save_keys, load_keys)
from aesfhe_tpu.ops.zeta import ZetaEncoder


def test_ciphertext_roundtrip(tmp_path, tiny_engine):
    E = tiny_engine
    eng = E["eng"]
    vec = np.arange(eng.slot_count, dtype=float) / eng.slot_count
    ct = eng.encrypt(vec, E["pk"])
    p = tmp_path / "ct.npz"
    save_ciphertext(p, ct)
    ct2 = load_ciphertext(p)
    assert ct2.scale == ct.scale
    dec = eng.decrypt(ct2, E["sk"])
    assert np.allclose(dec.real, vec, atol=1e-3)


def test_key_serialization_roundtrip(tmp_path, tiny_engine):
    E = tiny_engine
    eng = E["eng"]
    p = tmp_path / "keys.npz"
    save_keys(p, secret=E["sk"], relin=E["rlk"], conj=E["conj"],
              rotation=E["rot"])
    loaded = load_keys(p)
    # loaded keys must be functionally identical: decrypt + rotate still work
    vec = np.arange(eng.slot_count, dtype=float)
    ct = eng.encrypt(vec, E["pk"])
    r = eng.rotate(ct, loaded["rotation"], 3)
    dec = eng.decrypt(r, loaded["secret"])
    assert np.allclose(dec.real, np.roll(vec, 3), atol=1e-3)


def test_hoisted_rotations_match_plain(tiny_engine):
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    vec = np.arange(sc, dtype=float)
    ct = eng.encrypt(vec, E["pk"])
    outs = eng.hoisted_rotations(ct, E["rot"], [0, 1, 4, 16])
    for s, o in zip([0, 1, 4, 16], outs):
        dec = eng.decrypt(o, E["sk"]).real
        assert np.allclose(dec, np.roll(vec, s), atol=2e-3), s


def test_cleanse_reduces_noise(test_engine):
    from tests.test_xor_service import _CtxShim
    from aesfhe_tpu.ops.xor_service import EngineWrapper, XORService
    E = test_engine
    wrap = EngineWrapper(ctx=_CtxShim(E))
    svc = XORService(wrap)
    sc = E["eng"].slot_count
    vals = np.arange(sc) % 16
    z = ZetaEncoder.to_zeta(vals, 16)
    # inject deliberate first-order noise
    noisy = z * (1 + 0.02) * np.exp(1j * 0.02)
    ct = wrap.encrypt(noisy)
    cleaned = svc.cleanse(ct)
    dec = wrap.decrypt(cleaned)
    err_before = np.max(np.abs(noisy - z))
    err_after = np.max(np.abs(dec[:sc] - z))
    assert err_after < err_before / 3


def test_op_counters(tiny_engine):
    E = tiny_engine
    eng = E["eng"]
    eng.reset_counters()
    vec = np.full(eng.slot_count, 0.5)
    ct = eng.encrypt(vec, E["pk"])
    _ = eng.multiply(ct, ct, E["rlk"])
    _ = eng.rotate(ct, E["rot"], 1)
    assert eng.counters["ct_mul"] == 1
    assert eng.counters["keyswitch"] >= 2   # relin + rotation hop
    assert eng.counters["rescale"] == 1
