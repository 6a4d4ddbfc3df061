"""Validate README's claim that the generated coefficient JSONs are
float-identical to the reference's checked-in artifacts
(/root/reference/xor_mono_coeffs.json, nibble_hi/lo_coeffs.json
half-spectrum files, sbox/coeffs/sbox_{hi,lo}_coeffs.json,
xor_256x256_coeffs.json).  Skips cleanly when the reference tree is not
mounted (this suite must pass standalone)."""
import json
from pathlib import Path

import numpy as np
import pytest

from aesfhe_tpu.coeffs.generate import COEFF_DIR

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not mounted")


def _dense_1d(path: Path) -> np.ndarray:
    d = json.loads(Path(path).read_text())
    v = np.zeros(int(d.get("n", 256)), dtype=complex)
    for i, re, im in d["entries"]:
        v[int(i)] = re + 1j * im
    return v


def _dense_2d(path: Path) -> dict:
    d = json.loads(Path(path).read_text())
    return {(int(i), int(j)): re + 1j * im for i, j, re, im in d["entries"]}


@pytest.mark.parametrize("ref,ours", [
    ("nibble_hi_coeffs.json", "nibble_hi_coeffs.json"),
    ("nibble_lo_coeffs.json", "nibble_lo_coeffs.json"),
    ("sbox/coeffs/sbox_hi_coeffs.json", "sbox_hi_coeffs.json"),
    ("sbox/coeffs/sbox_lo_coeffs.json", "sbox_lo_coeffs.json"),
])
def test_1d_coeffs_match_reference(ref, ours):
    a = _dense_1d(REF / ref)
    b = _dense_1d(COEFF_DIR / ours)
    assert a.shape == b.shape
    # same IFFT construction on both sides: agreement is at the f64 noise
    # floor, far tighter than the files' stored tol=1e-12
    assert np.abs(a - b).max() < 1e-12


@pytest.mark.parametrize("ref,ours,n_entries", [
    ("xor_mono_coeffs.json", "xor_mono_coeffs.json", 64),
    ("xor_256x256_coeffs.json", "xor_256x256_coeffs.json", 16384),
])
def test_2d_coeffs_match_reference(ref, ours, n_entries):
    a = _dense_2d(REF / ref)
    b = _dense_2d(COEFF_DIR / ours)
    assert len(a) == len(b) == n_entries       # identical sparsity pattern
    assert set(a) == set(b)
    diff = max(abs(a[k] - b[k]) for k in a)
    assert diff < 1e-12
