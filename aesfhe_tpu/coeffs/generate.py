"""Offline LUT coefficient generators (zeta-domain polynomial interpolation).

Reproduces every JSON artifact of the reference with identical schemas:
  - 1D LUTs via IFFT of zeta^f(x)        (/root/reference/sbox/generate_sbox_coeffs.py:34-43)
  - conjugate-symmetry enforcement + half-spectrum 1D save
                                          (/root/reference/generator/generate_nibble_coeff.py:6-19,54-69)
  - 2D LUTs via IFFT2 + sparse save       (/root/reference/generator/generate_nibble_coeff.py:33-44,72-87)
  - S-box hi/lo 8->4 split                (/root/reference/sbox/generate_sbox_coeffs.py:66-73)
  - GF(2^8) x2/x3 full 8->8 and hi/lo     (/root/reference/generator/generate_gf2_gf3_coeffs.py:47-68)
  - 256x256 XOR                           (/root/reference/xor_lut_.ipynb)

Plus one new artifact for the TPU build's consistent nibble pipeline:
  - lo_lift_coeffs.json: 16-point LUT mapping zeta16^l -> zeta256^l, used to
    recombine (hi, lo) nibbles into a byte without the reference's broken
    power-of-16 recombine (see SURVEY.md section 3.5 WIP notes).

JSON schemas: 1D {n, tol, entries: [[i, re, im]]}, 2D {shape, tol,
entries: [[i, j, re, im]]}.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

COEFF_DIR = Path(__file__).resolve().parent

# AES S-box (standard table, also at /root/reference/sbox/generate_sbox_coeffs.py:13-31)
AES_SBOX = np.array([
    0x63, 0x7c, 0x77, 0x7b, 0xf2, 0x6b, 0x6f, 0xc5, 0x30, 0x01, 0x67, 0x2b, 0xfe, 0xd7, 0xab, 0x76,
    0xca, 0x82, 0xc9, 0x7d, 0xfa, 0x59, 0x47, 0xf0, 0xad, 0xd4, 0xa2, 0xaf, 0x9c, 0xa4, 0x72, 0xc0,
    0xb7, 0xfd, 0x93, 0x26, 0x36, 0x3f, 0xf7, 0xcc, 0x34, 0xa5, 0xe5, 0xf1, 0x71, 0xd8, 0x31, 0x15,
    0x04, 0xc7, 0x23, 0xc3, 0x18, 0x96, 0x05, 0x9a, 0x07, 0x12, 0x80, 0xe2, 0xeb, 0x27, 0xb2, 0x75,
    0x09, 0x83, 0x2c, 0x1a, 0x1b, 0x6e, 0x5a, 0xa0, 0x52, 0x3b, 0xd6, 0xb3, 0x29, 0xe3, 0x2f, 0x84,
    0x53, 0xd1, 0x00, 0xed, 0x20, 0xfc, 0xb1, 0x5b, 0x6a, 0xcb, 0xbe, 0x39, 0x4a, 0x4c, 0x58, 0xcf,
    0xd0, 0xef, 0xaa, 0xfb, 0x43, 0x4d, 0x33, 0x85, 0x45, 0xf9, 0x02, 0x7f, 0x50, 0x3c, 0x9f, 0xa8,
    0x51, 0xa3, 0x40, 0x8f, 0x92, 0x9d, 0x38, 0xf5, 0xbc, 0xb6, 0xda, 0x21, 0x10, 0xff, 0xf3, 0xd2,
    0xcd, 0x0c, 0x13, 0xec, 0x5f, 0x97, 0x44, 0x17, 0xc4, 0xa7, 0x7e, 0x3d, 0x64, 0x5d, 0x19, 0x73,
    0x60, 0x81, 0x4f, 0xdc, 0x22, 0x2a, 0x90, 0x88, 0x46, 0xee, 0xb8, 0x14, 0xde, 0x5e, 0x0b, 0xdb,
    0xe0, 0x32, 0x3a, 0x0a, 0x49, 0x06, 0x24, 0x5c, 0xc2, 0xd3, 0xac, 0x62, 0x91, 0x95, 0xe4, 0x79,
    0xe7, 0xc8, 0x37, 0x6d, 0x8d, 0xd5, 0x4e, 0xa9, 0x6c, 0x56, 0xf4, 0xea, 0x65, 0x7a, 0xae, 0x08,
    0xba, 0x78, 0x25, 0x2e, 0x1c, 0xa6, 0xb4, 0xc6, 0xe8, 0xdd, 0x74, 0x1f, 0x4b, 0xbd, 0x8b, 0x8a,
    0x70, 0x3e, 0xb5, 0x66, 0x48, 0x03, 0xf6, 0x0e, 0x61, 0x35, 0x57, 0xb9, 0x86, 0xc1, 0x1d, 0x9e,
    0xe1, 0xf8, 0x98, 0x11, 0x69, 0xd9, 0x8e, 0x94, 0x9b, 0x1e, 0x87, 0xe9, 0xce, 0x55, 0x28, 0xdf,
    0x8c, 0xa1, 0x89, 0x0d, 0xbf, 0xe6, 0x42, 0x68, 0x41, 0x99, 0x2d, 0x0f, 0xb0, 0x54, 0xbb, 0x16
], dtype=np.uint8)


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a = (a ^ 0x1B) & 0xFF
    return a


def gmul(a: int, b: int) -> int:
    """GF(2^8) multiply (AES polynomial x^8+x^4+x^3+x+1)."""
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        b >>= 1
        a = _xtime(a)
    return r


def gf_table(mult: int) -> np.ndarray:
    return np.array([gmul(x, mult) for x in range(256)], dtype=np.uint8)


# ---------------------------------------------------------------------------

def compute_1d_lut_coeffs(output_func, n: int = 256,
                          use_symmetry: bool = False) -> np.ndarray:
    """coeffs = ifft(zeta_n^f(x)); optional conjugate-symmetry averaging."""
    zeta = np.exp(-2j * np.pi / n)
    lut = np.array([zeta ** int(output_func(x)) for x in range(n)],
                   dtype=np.complex128)
    coeffs = np.fft.ifft(lut)
    if use_symmetry:
        coeffs = apply_conjugate_symmetry_1d(coeffs)
    return coeffs


def apply_conjugate_symmetry_1d(coeffs: np.ndarray) -> np.ndarray:
    n = coeffs.shape[0]
    res = coeffs.copy()
    for k in range(1, n // 2):
        avg = (res[k] + np.conj(res[n - k])) / 2
        res[k] = avg
        res[n - k] = np.conj(avg)
    if n % 2 == 0:
        res[n // 2] = res[n // 2].real + 0j
    return res


def compute_2d_lut_coeffs(output_func, n: int = 16) -> np.ndarray:
    zeta = np.exp(-2j * np.pi / n)
    i = np.arange(n)
    f = np.array([[int(output_func(a, b)) for b in range(n)] for a in range(n)])
    lut2d = zeta ** f
    return np.fft.ifft2(lut2d)


def lo_lift_coeffs() -> np.ndarray:
    """16-point interpolation of zeta16^l -> zeta256^l (new TPU artifact)."""
    lut = np.exp(-2j * np.pi * np.arange(16) / 256)
    return np.fft.ifft(lut)


# ---------------------------------------------------------------------------

def save_1d_coeffs(coeffs: np.ndarray, path: Path, tol: float = 1e-12,
                   half: bool = False, note: str | None = None):
    n = coeffs.shape[0]
    upper = n // 2 + 1 if half else n
    entries = [[int(k), float(coeffs[k].real), float(coeffs[k].imag)]
               for k in range(upper) if abs(coeffs[k]) > tol]
    data = {"n": n, "tol": tol, "entries": entries}
    if note:
        data["note"] = note
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(data, indent=2))


def save_2d_coeffs(coeffs: np.ndarray, path: Path, tol: float = 1e-12):
    n, m = coeffs.shape
    entries = [[int(i), int(j), float(coeffs[i, j].real),
                float(coeffs[i, j].imag)]
               for i in range(n) for j in range(m)
               if abs(coeffs[i, j]) > tol]
    data = {"shape": [n, m], "tol": tol, "entries": entries}
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(data, indent=2))


def load_1d_coeffs(path: Path, mirror_half: bool = True) -> np.ndarray:
    """Dense complex coefficient vector from a 1D JSON; if the file stores
    only the half spectrum (nibble saves), mirror via conjugate symmetry."""
    data = json.loads(Path(path).read_text())
    n = data.get("n") or len(data["entries"])
    coeffs = np.zeros(n, dtype=np.complex128)
    present = np.zeros(n, dtype=bool)
    for i, re, im in data["entries"]:
        coeffs[int(i)] = re + 1j * im
        present[int(i)] = True
    if mirror_half and not present[n // 2 + 1:].any():
        for k in range(1, n // 2):
            if present[k] and not present[n - k]:
                coeffs[n - k] = np.conj(coeffs[k])
    return coeffs


def load_2d_coeffs(path: Path) -> dict[tuple[int, int], complex]:
    data = json.loads(Path(path).read_text())
    return {(int(i), int(j)): complex(re, im)
            for i, j, re, im in data["entries"]}


# ---------------------------------------------------------------------------

def generate_all(out_dir: Path | None = None) -> dict[str, Path]:
    """Generate every coefficient artifact (reference parity + TPU extras)."""
    out = Path(out_dir) if out_dir else COEFF_DIR
    gf2 = gf_table(2)
    gf3 = gf_table(3)
    paths = {}

    def p1(name, coeffs, **kw):
        path = out / name
        save_1d_coeffs(coeffs, path, **kw)
        paths[name] = path

    def p2(name, coeffs):
        path = out / name
        save_2d_coeffs(coeffs, path)
        paths[name] = path

    # XOR LUTs
    p2("xor_mono_coeffs.json", compute_2d_lut_coeffs(lambda i, j: i ^ j, 16))
    p2("xor_256x256_coeffs.json",
       compute_2d_lut_coeffs(lambda i, j: i ^ j, 256))
    # nibble extraction (zeta256-exponent convention of the checked-in files)
    p1("nibble_hi_coeffs.json",
       compute_1d_lut_coeffs(lambda x: x // 16, 256, use_symmetry=True),
       half=True)
    p1("nibble_lo_coeffs.json",
       compute_1d_lut_coeffs(lambda x: x % 16, 256, use_symmetry=True),
       half=True)
    p1("nibble_test.json", compute_1d_lut_coeffs(lambda x: x % 16, 16))
    # nibble extraction, zeta16-output convention (hi LUT used by our ARK):
    # f(x) = (x>>4)*16 so the output is zeta256^(16*hi) = zeta16^hi
    p1("nibble_hi16_coeffs.json",
       compute_1d_lut_coeffs(lambda x: (x >> 4) * 16, 256),
       note="256->16 hi-nibble LUT with zeta16-domain output (TPU build)")
    # S-box 8->4 split
    p1("sbox_hi_coeffs.json",
       compute_1d_lut_coeffs(lambda x: (AES_SBOX[x] >> 4) * 16, 256),
       note="8-to-4 S-Box LUT coefficients via IFFT")
    p1("sbox_lo_coeffs.json",
       compute_1d_lut_coeffs(lambda x: AES_SBOX[x] & 0xF, 256),
       note="8-to-4 S-Box LUT coefficients via IFFT")
    # GF x2 / x3
    p1("gf2_8to8_coeffs.json", compute_1d_lut_coeffs(lambda x: gf2[x], 256))
    p1("gf3_8to8_coeffs.json", compute_1d_lut_coeffs(lambda x: gf3[x], 256))
    p1("gf2_hi_coeffs.json",
       compute_1d_lut_coeffs(lambda x: (gf2[x] >> 4) * 16, 256))
    p1("gf2_lo_coeffs.json", compute_1d_lut_coeffs(lambda x: gf2[x] & 0xF, 256))
    p1("gf3_hi_coeffs.json",
       compute_1d_lut_coeffs(lambda x: (gf3[x] >> 4) * 16, 256))
    p1("gf3_lo_coeffs.json", compute_1d_lut_coeffs(lambda x: gf3[x] & 0xF, 256))
    # GF inverse-MixColumns multipliers x9/x11/x13/x14 (promised by the
    # reference's GFService docstring /root/reference/gf_service.py:24-26 but
    # never implemented there)
    for m in (9, 11, 13, 14):
        gfm = gf_table(m)
        p1(f"gf{m}_hi_coeffs.json",
           compute_1d_lut_coeffs(lambda x: (gfm[x] >> 4) * 16, 256))
        p1(f"gf{m}_lo_coeffs.json",
           compute_1d_lut_coeffs(lambda x: gfm[x] & 0xF, 256))
    # nibble-domain (4->4) GF LUTs (generate_gf_lut_coeffs.py intent)
    p1("gf2_nibble_coeffs.json",
       compute_1d_lut_coeffs(lambda x: gf2[x] & 0xF, 16))
    p1("gf3_nibble_coeffs.json",
       compute_1d_lut_coeffs(lambda x: gf3[x] & 0xF, 16))
    # TPU extra: zeta16 -> zeta256 lift for nibble recombine
    p1("lo_lift_coeffs.json", lo_lift_coeffs(),
       note="zeta16^l -> zeta256^l lift LUT (TPU build)")
    # TPU extra: 2D nibble-pair GF multipliers (hi', lo') = f(hi, lo) in the
    # zeta16 domain, so MixColumns can run entirely on nibble pairs where
    # XOR is the cheap 16x16 LUT (see ops/mixcolumns_service.py)
    for m in (2, 3, 9, 11, 13, 14):
        gfm = gf_table(m)

        def hi2d(h, l, t=gfm):
            return t[(h << 4) | l] >> 4

        def lo2d(h, l, t=gfm):
            return t[(h << 4) | l] & 0xF

        p2(f"gf{m}_hi2d_coeffs.json", compute_2d_lut_coeffs(hi2d, 16))
        p2(f"gf{m}_lo2d_coeffs.json", compute_2d_lut_coeffs(lo2d, 16))
    # TPU extra: 2D nibble-pair S-box (and inverse) -- lets SubBytes run in
    # the nibble-pair domain at LUT degree 15 instead of 255
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[AES_SBOX] = np.arange(256, dtype=np.uint8)
    for name, tbl in (("sbox", AES_SBOX), ("inv_sbox", inv_sbox)):
        p2(f"{name}_hi2d_coeffs.json", compute_2d_lut_coeffs(
            lambda h, l, t=tbl: t[(h << 4) | l] >> 4, 16))
        p2(f"{name}_lo2d_coeffs.json", compute_2d_lut_coeffs(
            lambda h, l, t=tbl: t[(h << 4) | l] & 0xF, 16))
    return paths


if __name__ == "__main__":
    for name, path in generate_all().items():
        print(name, "->", path)
