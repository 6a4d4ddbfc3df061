"""ShiftRows as masked slot rotations.

Port of /root/reference/shiftrows_service.py:5-69 (interleaved column-major
layout: row r occupies slots r, r+4, r+8, r+12 of each 16-slot block), plus a
SIMD-correct multi-block variant: the reference's single global rotation
leaks bytes across block boundaries when more than one AES block is packed;
the fix is the standard two-rotation in-block cyclic shift (mask the wrapping
columns separately).
"""
from __future__ import annotations

import numpy as np

from ..core.ciphertext import Ciphertext
from .xor_service import EngineWrapper, XORService


class AESFHEShiftRows:
    def __init__(self, engine_wrapper: EngineWrapper,
                 xor_svc: XORService | None = None):
        self.eng = engine_wrapper
        self.xor_svc = xor_svc
        sc = self.eng.engine.slot_count
        self.sc = sc
        # reference masks: first block only (shiftrows_service.py:22-31)
        self.row_rot = [0, -4, -8, -12]
        self.masks = []
        for r in range(4):
            mask = np.zeros(sc)
            mask[r:16:4] = 1.0
            self.masks.append(self.eng.encode(mask))
        # SIMD masks: tiled over every 16-slot block, split into the part
        # that stays in-block under a left rotation and the wrapping part
        self._simd_masks = {}
        idx = np.arange(sc)
        pos = idx % 16
        row = pos % 4
        col = pos // 4
        for r in range(1, 4):
            # forward (left shift by r): col >= r stays in block (rot -4r),
            # col < r wraps (rot +16-4r)
            keep_f = ((row == r) & (col >= r)).astype(float)
            wrap_f = ((row == r) & (col < r)).astype(float)
            # inverse (right shift by r): col < 4-r stays (rot +4r),
            # col >= 4-r wraps (rot -(16-4r))
            keep_i = ((row == r) & (col < 4 - r)).astype(float)
            wrap_i = ((row == r) & (col >= 4 - r)).astype(float)
            self._simd_masks[r] = dict(
                fwd=(self.eng.encode(keep_f), self.eng.encode(wrap_f)),
                inv=(self.eng.encode(keep_i), self.eng.encode(wrap_i)))
        self._row_mask_simd = [
            self.eng.encode((row == r).astype(float)) for r in range(4)]

    # -- public API ------------------------------------------------------
    def shift_rows(self, ct: Ciphertext) -> Ciphertext:
        """ShiftRows on every packed block.  Delegates to the SIMD in-block
        implementation: the reference's single global rotation per row
        (/root/reference/shiftrows_service.py:41-51) leaks the wrapping
        column past the block boundary, so its output is wrong at the row
        wrap even for a single block."""
        return self.shift_rows_simd(ct)

    def inverse_shift_rows(self, ct: Ciphertext) -> Ciphertext:
        return self.shift_rows_simd(ct, inverse=True)

    def shift_rows_reference_layout(self, ct: Ciphertext) -> Ciphertext:
        """Bug-for-bug port of the reference's masked single-rotation
        variant (kept for behavioral comparison only)."""
        out = None
        for r in range(4):
            m = self.eng.multiply_plain(ct, self.masks[r])
            if self.row_rot[r] != 0:
                m = self.eng.rotate(m, self.row_rot[r])
            out = m if out is None else self.eng.add(out, m)
        return out

    # -- SIMD multi-block variant ---------------------------------------
    def shift_rows_simd(self, ct: Ciphertext, inverse: bool = False
                        ) -> Ciphertext:
        """In-block ShiftRows for every packed AES block: row r moves left by
        r columns cyclically *within its own block* (two masked rotations
        per row instead of the reference's boundary-crossing single one)."""
        eng = self.eng
        out = eng.multiply_plain(ct, self._row_mask_simd[0])
        for r in range(1, 4):
            if not inverse:
                keep, wrap = self._simd_masks[r]["fwd"]
                rot_keep, rot_wrap = -4 * r, 16 - 4 * r
            else:
                keep, wrap = self._simd_masks[r]["inv"]
                rot_keep, rot_wrap = 4 * r, -(16 - 4 * r)
            m_keep = eng.rotate(eng.multiply_plain(ct, keep), rot_keep)
            m_wrap = eng.rotate(eng.multiply_plain(ct, wrap), rot_wrap)
            out = eng.add(out, eng.add(m_keep, m_wrap))
        return out
