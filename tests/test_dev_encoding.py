"""Device-side encode/decode (core/dev_encoding.py): the c64 on-device
embedding must agree with the exact host f64 path to well within every
decode margin, and the exact 2-limb Garner decode must reproduce the host
CRT decode.  Replaces the host FFT in the bit-plane hot loop (the reference
hides this inside desilofhe's native encode,
/root/reference/xor_service.py:65-66)."""
import numpy as np
import pytest

from aesfhe_tpu.core import dev_encoding, encoding
from aesfhe_tpu.core.ciphertext import Ciphertext
from aesfhe_tpu.ops.zeta import ZetaEncoder


def test_encode_dev_matches_host(tiny_engine):
    eng = tiny_engine["eng"]
    params = eng.params
    rng = np.random.default_rng(7)
    z = (rng.standard_normal(params.slot_count)
         + 1j * rng.standard_normal(params.slot_count))
    pt_host = eng.encode(z)
    pt_dev = eng.encode(z, device=True)
    # compare in the decoded domain: both must reproduce z to encode noise
    got_host = eng.decrypt(
        Ciphertext(data=pt_host.data[None], scale=pt_host.scale),
        tiny_engine["sk"])
    # trivial ct (b = m): decrypting a rank-1 stack skips the s*a term
    got_dev = eng.decrypt(
        Ciphertext(data=pt_dev.data[None], scale=pt_dev.scale),
        tiny_engine["sk"])
    assert np.max(np.abs(got_host - z)) < 1e-5
    assert np.max(np.abs(got_dev - z)) < 1e-4      # c64 FFT budget


def test_encrypt_decrypt_device_roundtrip(tiny_engine):
    eng, sk, pk = (tiny_engine["eng"], tiny_engine["sk"], tiny_engine["pk"])
    rng = np.random.default_rng(8)
    vals = rng.integers(0, 16, eng.slot_count, dtype=np.uint8)
    z = ZetaEncoder.to_zeta(vals, 16)
    ct = eng.encrypt(z, pk, device=True)
    # host decode of a device-encoded ct
    assert np.array_equal(
        ZetaEncoder.from_zeta(eng.decrypt(ct, sk), 16), vals)
    # device decode of the same ct (2-limb Garner + c64 IFFT)
    got = eng.decrypt(ct, sk, device=True)
    assert np.array_equal(ZetaEncoder.from_zeta(got, 16), vals)
    assert np.max(np.abs(got - z)) < 1e-3


def test_decrypt_device_matches_host_after_ops(tiny_engine):
    """Device decode stays exact through a real multiply+rescale chain."""
    eng, sk, pk = (tiny_engine["eng"], tiny_engine["sk"], tiny_engine["pk"])
    rlk = tiny_engine["rlk"]
    rng = np.random.default_rng(9)
    a = rng.uniform(-1, 1, eng.slot_count)
    ct = eng.encrypt(a, pk)
    sq = eng.multiply(ct, ct, rlk)
    host = eng.decrypt(sq, sk)
    dev = eng.decrypt(sq, sk, device=True)
    assert np.max(np.abs(dev - host)) < 1e-3
    assert np.max(np.abs(dev.real - a * a)) < 1e-2


def test_bitplane_state_device_roundtrip(tiny_engine):
    """encrypt_state/decrypt_state (now device-side) round-trip exactly."""
    from aesfhe_tpu.ops.bitplane import BitSliceService

    class _Wrap:
        def __init__(self, E):
            self.engine, self._sk, self._pk = E["eng"], E["sk"], E["pk"]
            self.rot_key = E["rot"]

        def encrypt(self, d, device=False):
            return self.engine.encrypt(np.asarray(d), self._pk,
                                       device=device)

        def decrypt(self, ct, device=False):
            return self.engine.decrypt(ct, self._sk, device=device)

        def ensure_rotation_steps(self, steps):
            pass

    svc = BitSliceService(_Wrap(tiny_engine))
    rng = np.random.default_rng(10)
    state = rng.integers(0, 256, svc.sc, dtype=np.uint8)
    assert np.array_equal(svc.decrypt_state(svc.encrypt_state(state)), state)
