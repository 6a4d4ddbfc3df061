"""AESFHERound nibble-pipeline tests: port of /root/reference/
test_all_process.py:21-87 (AddRoundKey end-to-end) and
test/test_shift_new_rows.py (row-blocked ShiftRows)."""
import numpy as np
import pytest

from aesfhe_tpu.ops.round_service import (AESFHERound, decrypt_and_recombine,
                                          get_shift_rows_masks)
from aesfhe_tpu.ops.xor_service import EngineWrapper, XORService
from aesfhe_tpu.ops.zeta import ZetaEncoder, split_nibbles


@pytest.fixture(scope="module")
def ark(test_engine):
    from tests.test_xor_service import _CtxShim
    wrap = EngineWrapper(ctx=_CtxShim(test_engine))
    return AESFHERound(wrap, XORService(wrap))


def test_full_round_ark(ark, test_engine):
    # /root/reference/test_all_process.py:33-37 / new.py:231-262
    sc = test_engine["eng"].slot_count
    rng = np.random.default_rng(1)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    key = rng.integers(0, 256, sc, dtype=np.uint8)
    result = ark.full_round(state, key, recombine=True)
    assert np.array_equal(result, state ^ key)


def test_full_round_ark_plain_key(ark, test_engine):
    sc = test_engine["eng"].slot_count
    rng = np.random.default_rng(2)
    state = rng.integers(0, 256, sc, dtype=np.uint8)
    key = rng.integers(0, 256, 16, dtype=np.uint8)
    key_t = np.tile(key, sc // 16)
    s_hi, s_lo = split_nibbles(state)
    k_hi, k_lo = split_nibbles(key_t)
    ct_hi, ct_lo = ark.encrypt_nibbles(s_hi, s_lo)
    out_hi, out_lo = ark.add_round_key_plain(ct_hi, ct_lo, k_hi, k_lo)
    out = decrypt_and_recombine(out_hi, out_lo, ark.eng, length=sc)
    assert np.array_equal(out, state ^ key_t)


def test_row_blocked_shift_rows(ark, test_engine):
    # row-blocked layout: [row0 of all blocks | row1 ... ]
    # (/root/reference/new.py:115-148, test/test_shift_new_rows.py:84)
    from tests.test_xor_service import _CtxShim
    ctx = _CtxShim(test_engine)
    eng = test_engine["eng"]
    sc = eng.slot_count
    mb = sc // 16
    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 256, (mb, 16), dtype=np.uint8)  # column-major
    # row-blocked flatten: slot r*4mb + 4? layout: rows-of-all-blocks:
    # row r occupies slots [4*r*mb, 4*(r+1)*mb) as (block-major, col within)
    rb = np.zeros(sc, dtype=np.uint8)
    for r in range(4):
        for c in range(4):
            for b in range(mb):
                rb[4 * r * mb + c * mb + b] = blocks[b][r + 4 * c]
    s_hi, s_lo = split_nibbles(rb)
    ct_hi, ct_lo = ark.encrypt_nibbles(s_hi, s_lo)
    out_hi, out_lo = AESFHERound.shift_rows(ctx, ct_hi, ct_lo)
    out = decrypt_and_recombine(out_hi, out_lo, ark.eng, length=sc)
    # expected: within each row-segment, left-rotate by r*mb slots
    want = np.zeros_like(rb)
    for r in range(4):
        seg = rb[4 * r * mb:4 * (r + 1) * mb]
        want[4 * r * mb:4 * (r + 1) * mb] = np.roll(seg, -r * mb)
    assert np.array_equal(out, want)


class DummyEngine:
    """decrypt == identity (port of /root/reference/test/test_recombine_mixcol.py:9-13)."""

    def decrypt(self, ct):
        return ct


def test_decrypt_and_recombine_dummy():
    import numpy as np
    from aesfhe_tpu.ops.zeta import ZetaEncoder
    vals = np.arange(32, dtype=np.uint8)
    hi = ZetaEncoder.to_zeta(vals >> 4, 16)
    lo = ZetaEncoder.to_zeta(vals & 0xF, 16)
    out = decrypt_and_recombine(hi, lo, DummyEngine(), length=32)
    assert np.array_equal(out, vals)
