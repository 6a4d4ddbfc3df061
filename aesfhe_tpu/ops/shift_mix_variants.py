"""Compatibility shims for the reference's merged shift+mix WIP variants.

The reference carries three parallel implementations of merged
ShiftRows+MixColumns:
  - AESFHETransformer (A), /root/reference/mixcolumns_service.py:8-88
  - AESFHETransformer (B), /root/reference/shiftrow_mixcolumns.py:7-131
    (multiplies zeta exponents instead of XORing -- incorrect shortcut,
    SURVEY.md section 2.2)
  - MixRow, /root/reference/shift_mix_zeta.py:8-122

SURVEY.md section 7 directs: reproduce the (A) design's capability, discard
the exponent-multiply trick.  This build has ONE verified implementation
(ops/mixcolumns_service.AESFHETransformer); the variant names delegate to it
so reference-shaped code keeps working.
"""
from __future__ import annotations

from typing import Any

import numpy as np

from .mixcolumns_service import AESFHETransformer, NibblePair
from .xor_service import EngineWrapper, XORService
from .zeta import ZetaEncoder


class MixRow:
    """shift_mix_zeta.MixRow compatibility (/root/reference/shift_mix_zeta.py:8-122)."""

    def __init__(self, xor_svc: XORService, eng_wrap: EngineWrapper):
        self.xor = xor_svc
        self.eng = eng_wrap
        self._tf = AESFHETransformer(eng_wrap, xor_svc)

    def shift_mix(self, state_bytes: np.ndarray):
        return self._tf.merged_shift_mix(state_bytes)

    def inv_shift_mix_from_ct(self, ct):
        """Inverse from ciphertext; the reference decrypts mid-way
        (/root/reference/shift_mix_zeta.py:117-122) -- here it stays
        encrypted end to end."""
        return self._tf.merged_inv_mixshift(ct)


class ShiftRowMixColTransformer:
    """shiftrow_mixcolumns.AESFHETransformer compatibility
    (/root/reference/shiftrow_mixcolumns.py:7-131), with the WIP
    exponent-multiply arithmetic replaced by the verified LUT circuit."""

    def __init__(self, xor_svc: XORService, eng_wrap: EngineWrapper):
        self.xor = xor_svc
        self.eng = eng_wrap
        self._tf = AESFHETransformer(eng_wrap, xor_svc)

    def merged_shift_mix(self, state_bytes: np.ndarray):
        return self._tf.merged_shift_mix(state_bytes)

    def merged_inv_mixshift(self, ct):
        return self._tf.merged_inv_mixshift(ct)
