"""Regression: service-level caches must never capture tracers.

Round-3 regression (MULTICHIP_r03 ok:false): XORService._ark_pt_cache cached
`eng.encode(...)` results produced under a `jax.eval_shape` trace; the cached
tracer was later pulled into a jitted mesh step -> UnexpectedTracerError.
The fix is the Engine._perm_dev guard pattern (core/engine.py): skip the
cache insert whenever the encoded value is a tracer.

These tests run each caching service op under jax.eval_shape FIRST (the
exact sequence __graft_entry__.dryrun_multichip performs via its scale
probe), assert the caches hold no tracers, then execute the op for real and
check the decrypted result -- so a reintroduced leak fails here instead of
in the driver's multichip dryrun.
"""
import numpy as np
import jax
import pytest

from aesfhe_tpu.core.ciphertext import Ciphertext
from aesfhe_tpu.ops.xor_service import EngineWrapper, XORService
from aesfhe_tpu.ops.zeta import ZetaEncoder, split_nibbles


class _CtxShim:
    def __init__(self, E):
        self.engine = E["eng"]
        self.secret_key = E["sk"]
        self.public_key = E["pk"]
        self.relinearization_key = E["rlk"]
        self.conjugation_key = E["conj"]
        self.rotation_key = E["rot"]
        self.bootstrap_key = None
        self.small_bootstrap_key = None


def _is_tracer(x) -> bool:
    return isinstance(x, jax.core.Tracer)


def test_ark_pt_cache_survives_eval_shape(tiny_engine):
    """_xor_with_plain_nibbles under eval_shape must not poison its
    per-key plaintext cache (the exact round-3 multichip breaker)."""
    wrap = EngineWrapper(ctx=_CtxShim(tiny_engine))
    svc = XORService(wrap)
    eng = wrap.engine
    sc = eng.slot_count
    rng = np.random.default_rng(7)
    state = rng.integers(0, 16, sc, dtype=np.uint8)
    key = np.tile(rng.integers(0, 16, 16, dtype=np.uint8), sc // 16)
    ct = eng.encrypt(ZetaEncoder.to_zeta(state, 16), wrap.public_key)
    scale = float(ct.scale)

    def step(data):
        return svc._xor_with_plain_nibbles(Ciphertext(data, scale), key).data

    # 1) abstract trace populates the code path with tracers
    jax.eval_shape(step, jax.ShapeDtypeStruct(ct.data.shape, ct.data.dtype))
    for pts, _ in svc._ark_pt_cache.values():
        assert not any(_is_tracer(pt.data) for _, pt in pts), (
            "tracer leaked into _ark_pt_cache")
    # 2) the real execution right after the trace must still be correct
    out = svc._xor_with_plain_nibbles(ct, key)
    got = ZetaEncoder.from_zeta(wrap.decrypt(out), 16)
    assert np.array_equal(got, state ^ key)
    # 3) and the cache (now concrete) must serve a second call unchanged
    out2 = svc._xor_with_plain_nibbles(ct, key)
    got2 = ZetaEncoder.from_zeta(wrap.decrypt(out2), 16)
    assert np.array_equal(got2, state ^ key)


def test_bitplane_pt_cache_survives_eval_shape(tiny_engine):
    """BitSliceService's dense-plaintext cache (ARK signs, ShiftRows masks)
    under eval_shape: no tracers cached, real run still exact."""
    from aesfhe_tpu.ops.bitplane import BitSliceService, BitState

    wrap = EngineWrapper(ctx=_CtxShim(tiny_engine))
    svc = BitSliceService(wrap)
    eng = wrap.engine
    sc = eng.slot_count
    rng = np.random.default_rng(8)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    key16 = rng.integers(0, 256, 16, dtype=np.uint8)
    st = svc.encrypt_state(state)
    scale = float(st.bits[0].scale)

    def step(*datas):
        s = BitState([Ciphertext(d, scale) for d in datas])
        s = svc.xor_plain(s, key16)
        s = svc.shift_rows(s)
        return tuple(b.data for b in s.bits)

    jax.eval_shape(step, *[jax.ShapeDtypeStruct(b.data.shape, b.data.dtype)
                           for b in st.bits])
    assert not any(_is_tracer(pt.data) for pt in svc._pt_cache.values()), (
        "tracer leaked into bitplane._pt_cache")

    out = svc.shift_rows(svc.xor_plain(st, key16))
    got = svc.decrypt_state(out)
    # plain oracle: XOR then ShiftRows on each 16-byte column-major block
    xored = state ^ np.tile(key16, sc // 16)
    want = np.empty_like(xored)
    idx = np.arange(sc)
    row, col = (idx % 16) % 4, (idx % 16) // 4
    src = (idx - idx % 16) + row + 4 * ((col + row) % 4)
    want = xored[src]
    assert np.array_equal(got, want)
