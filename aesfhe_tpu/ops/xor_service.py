"""Homomorphic XOR / AddRoundKey services.

TPU-native port of /root/reference/xor_service.py (XORConfig, EngineWrapper,
CoefficientCache, FullXORCache, XORService).  Same service API -- including
the *intended* constructor the reference's tests assume (explicit nibble and
full-XOR cache injection, /root/reference/test/test_xor_service.py:17-27,
SURVEY.md section 4 WIP notes) -- with a TPU-first evaluation strategy:

  reference hot loop (xor_cipher, xor_service.py:283-286):
      64 sequential ct*ct multiplies + 64 relinearizations + 64 adds
  here:
      8 fused linear-combination kernels (one rescale each) +
      one batched tensor-sum with a single hoisted relinearization

Domain conventions (the reference's WIP code mixes these up; see SURVEY.md
sections 3.5/4): a byte b is zeta256^b; a nibble v is zeta16^v.  Nibble
extraction returns zeta16-domain nibbles; recombination lifts the low nibble
back to zeta256 via the lo_lift LUT instead of the reference's broken
power-of-16 recombine (/root/reference/xor_service.py:541-547).
"""
from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np
import jax

from ..context import EngineContext
from ..core.engine import Engine
from ..core.ciphertext import Ciphertext, ScalarPlaintext
from .zeta import ZetaEncoder, split_nibbles
from ..coeffs import generate as coeffgen

COEFF_DIR = coeffgen.COEFF_DIR


class XORConfig:
    """Configuration (port of /root/reference/xor_service.py:16-33, extended
    with the nibble/full-XOR paths the reference's tests pass)."""

    def __init__(self,
                 coeffs_path: Path = COEFF_DIR / "xor_mono_coeffs.json",
                 nibble_hi_path: Path = COEFF_DIR / "nibble_hi16_coeffs.json",
                 nibble_lo_path: Path = COEFF_DIR / "nibble_test.json",
                 mul_coeffs_path: Path = COEFF_DIR / "xor_256x256_coeffs.json",
                 lo_lift_path: Path = COEFF_DIR / "lo_lift_coeffs.json",
                 max_level: int | None = None,
                 mode: str = "parallel",
                 thread_count: int = 8,
                 device_id: int = 0,
                 profile: str | None = None,
                 params=None,
                 use_bootstrap: bool = False,
                 rotation_steps=None):
        self.coeffs_path = Path(coeffs_path)
        self.nibble_hi_path = Path(nibble_hi_path)
        self.nibble_lo_path = Path(nibble_lo_path)
        self.mul_coeffs_path = Path(mul_coeffs_path)
        self.mul_path = self.mul_coeffs_path          # test alias
        self.lo_lift_path = Path(lo_lift_path)
        self.max_level = max_level
        self.mode = mode
        self.thread_count = thread_count
        self.device_id = device_id
        self.profile = profile
        self.params = params
        self.use_bootstrap = use_bootstrap
        # None -> power-of-two rotation ladder; sequence (possibly empty)
        # -> only those fixed Galois keys.  Full-ring bootstrapped runs
        # pass () and let each service ensure_rotation_steps its own.
        self.rotation_steps = rotation_steps


class EngineWrapper:
    """Ergonomic op facade (port of /root/reference/xor_service.py:36-129)."""

    def __init__(self, config: XORConfig | None = None, *,
                 ctx: EngineContext | None = None):
        config = config or XORConfig()
        if ctx is None:
            ctx = EngineContext(
                signature=1,
                params=config.params,
                profile=config.profile,
                use_bootstrap=config.use_bootstrap,
                max_level=config.max_level,
                mode=config.mode,
                thread_count=config.thread_count,
                device_id=config.device_id,
                rotation_steps=config.rotation_steps,
            )
        self.ctx = ctx
        self.engine: Engine = ctx.engine
        self.public_key = ctx.public_key
        self.secret_key = ctx.secret_key
        self.relin_key = ctx.relinearization_key
        self.conj_key = ctx.conjugation_key
        self.rot_key = ctx.rotation_key
        self.boot_key = ctx.bootstrap_key

    def encrypt(self, data, device: bool = False):
        return self.engine.encrypt(np.asarray(data), self.public_key,
                                   device=device)

    def decrypt(self, ct, device: bool = False) -> np.ndarray:
        return self.engine.decrypt(ct, self.secret_key, device=device)

    def encode(self, vec):
        return self.engine.encode(np.asarray(vec))

    def multiply(self, a, b, relin_key=None):
        if isinstance(a, Ciphertext) and isinstance(b, Ciphertext):
            return self.engine.multiply(a, b, relin_key or self.relin_key)
        return self.engine.multiply(a, b)

    def add(self, a, b):
        return self.engine.add(a, b)

    def add_plain(self, ct, val):
        return self.engine.add_plain(ct, val)

    def make_power_basis(self, ct, degree: int):
        return self.engine.make_power_basis(ct, degree, self.relin_key)

    def conjugate(self, ct):
        return self.engine.conjugate(ct, self.conj_key)

    def multiply_plain(self, ct, val):
        return self.engine.multiply_plain(ct, val)

    def rotate(self, ct, steps: int):
        return self.engine.rotate(ct, self.rot_key, steps)

    def relinearize(self, ct, relin_key=None):
        # degree-2 only; degree-1 input raises inside the engine and is
        # swallowed here (/root/reference/xor_service.py:107-118)
        try:
            return self.engine.relinearize(ct, relin_key or self.relin_key)
        except RuntimeError as e:
            if "should have 3 polynomials" in str(e):
                return ct
            raise

    def bootstrap(self, ct):
        import os
        if os.environ.get("AESFHE_FUSED_BOOT", "0") != "0":
            return self._bootstrap_fused(ct)
        return self.engine.bootstrap(ct, self.relin_key, self.conj_key,
                                     self.boot_key)

    # fused-bootstrap instances, one per input (level, scale) signature;
    # the flagship's uniform work level needs exactly one
    _fused_boot: dict | None = None

    def _bootstrap_fused(self, ct):
        """Whole-bootstrap-as-one-XLA-program path (bootstrap.FusedBootstrap;
        ~1300 relay launches -> 1).  Opt-in via AESFHE_FUSED_BOOT=1; each new
        input signature pays one eager capture run + one compile, both
        covered by the persistent compile cache on reruns."""
        from ..bootstrap import FusedBootstrap
        if self._fused_boot is None:
            self._fused_boot = {}
        # normalize to level 0: ModRaise only reads the bottom-prime
        # residues, so dropping first makes ONE compiled program serve
        # every input level (round outputs land at level 1 or 2)
        ct = self.engine._drop(ct, 0)
        key = round(float(np.log2(ct.scale)) * 1e4)   # ~1e-5 rel. buckets
        inst = self._fused_boot.get(key)
        if inst is None:
            # the capture is ABSTRACT (jax.eval_shape -- no device work, no
            # per-op executables; see FusedBootstrap.__init__), so the first
            # call pays only the three fused compiles
            inst = FusedBootstrap(self.engine, self.relin_key, self.conj_key,
                                  self.boot_key, ct)
            self._fused_boot[key] = inst
        return inst(ct)

    # optional level cap for service-generated rotation keys: a flagship
    # prod_boot round never rotates above level ~19, and a full-basis key
    # is 231 MB vs 95 MB capped (keys.SwitchKey.cap); set by memory-tight
    # drivers BEFORE constructing services
    rot_lvl_cap: int | None = None

    def ensure_rotation_steps(self, steps, lvl_cap: int | None = None):
        """Generate direct Galois keys for any `steps` missing from the
        rotation key set (hoisted_rotations needs direct keys; the default
        set is the power-of-two ladder).  Requires the secret key, i.e. the
        key-owning party -- services call this at construction time, the
        same place the reference generates its fixed-rotation keys
        (/root/reference/engine_context.py:68-69)."""
        from ..core import keys as keys_mod
        params = self.engine.params
        sc = params.slot_count
        cap = self.rot_lvl_cap if lvl_cap is None else lvl_cap

        def _insufficient(g: int) -> bool:
            k = self.rot_key.keys.get(g)
            if k is None:
                return True
            # a shared key with a level cap BELOW this service's rotation
            # ceiling (or with any cap when the ceiling is unbounded) would
            # assert at switch time -- regenerate a tall-enough one
            kcap = getattr(k, "cap", None)
            return kcap is not None and (cap is None or kcap < cap)

        missing = [s % sc for s in steps
                   if s % sc and _insufficient(params.rot_galois_elt(s % sc))]
        if missing:
            fixed = keys_mod.gen_rotation_keys(params, self.engine.tabs,
                                               self.secret_key,
                                               sorted(set(missing)),
                                               lvl_cap=cap)
            self.rot_key.keys.update(fixed.keys)

    # TPU-first fused reductions, exposed for the services
    def linear_combination(self, cts, coeffs, constant=0.0,
                           target_scale=None):
        return self.engine.linear_combination(cts, coeffs, constant,
                                              target_scale=target_scale)

    def inner_product(self, lhs, rhs):
        return self.engine.inner_product(lhs, rhs, self.relin_key)


class CoefficientCache:
    """JSON -> complex coefficient dict; 1D [i,re,im] and 2D [i,j,re,im]
    entries (port of /root/reference/xor_service.py:148-196).  Plaintext
    encodings are symbolic ScalarPlaintexts (O(1) memory per coefficient)."""

    def __init__(self, path: Path):
        self.path = Path(path)
        self._coeffs = None

    def load_coeffs(self) -> Dict[Any, complex]:
        if self._coeffs is None:
            data = json.loads(self.path.read_text(encoding="utf-8"))
            coeffs: Dict[Any, complex] = {}
            for entry in data["entries"]:
                if len(entry) == 3:
                    i, re, im = entry
                    coeffs[int(i)] = re + 1j * im
                elif len(entry) == 4:
                    i, j, re, im = entry
                    coeffs[(int(i), int(j))] = re + 1j * im
                else:
                    raise ValueError(f"Unrecognized entry format: {entry}")
            self._coeffs = coeffs
        return self._coeffs

    def get_plaintext_coeffs(self, eng: EngineWrapper) -> Dict[Any, Any]:
        scale = eng.engine.params.scale
        return {k: ScalarPlaintext(v, scale)
                for k, v in self.load_coeffs().items()}


class FullXORCache(CoefficientCache):
    """256x256 XOR coefficient cache (/root/reference/xor_service.py:199-224)."""

    def load_coeffs(self) -> Dict[Tuple[int, int], complex]:
        coeffs = super().load_coeffs()
        assert all(isinstance(k, tuple) for k in coeffs)
        return coeffs


def _dense_1d(path: Path, n: int) -> np.ndarray:
    c = coeffgen.load_1d_coeffs(path)
    assert len(c) == n, (path, len(c), n)
    return c


# ---------------------------------------------------------------------------
# Shared LUT evaluation helpers.  One definition each: the byte-domain power
# basis and the bilinear 2D-LUT sum are used by XORService, SBoxService,
# GFService and AESFHETransformer alike -- divergent copies of this exact
# plumbing were round-2 review finding #6.
# ---------------------------------------------------------------------------

def build_power_basis_256(eng: EngineWrapper,
                          ct: Ciphertext) -> Dict[int, Ciphertext]:
    """t^1..t^255 in the zeta256 domain: a binary-depth ladder to t^128 plus
    conjugations for the upper half, t^(256-k) = conj(t^k)
    (/root/reference/xor_service.py:290-298; the reference's dense basis
    costs 255 sequential multiplies, /root/reference/sbox/sbox_service.py:93)."""
    pos = eng.make_power_basis(ct, 128)
    basis = {k: pos[k - 1] for k in range(1, 129)}
    for k in range(129, 256):
        basis[k] = eng.conjugate(pos[256 - k - 1])
    return basis


def eval_lut_1d(eng: EngineWrapper, basis: Dict[int, Ciphertext],
                coeffs: np.ndarray) -> Ciphertext:
    """sum_k coeffs[k] * t^k over a prebuilt power basis, as ONE fused
    linear-combination kernel (constant term handled symbolically)."""
    ks = [k for k in range(1, len(coeffs)) if abs(coeffs[k]) > 1e-12]
    return eng.linear_combination([basis[k] for k in ks],
                                  [coeffs[k] for k in ks],
                                  constant=coeffs[0])


def bilinear_lut(eng: EngineWrapper, bx: Dict[int, Ciphertext],
                 by: Dict[int, Ciphertext], coeffs) -> Ciphertext:
    """res = sum_ij c_ij x^i y^j from prebuilt power bases.

    Row-major fusion: each row i collapses to one fused linear combination
    over by, then all rows reduce in a single batched inner product with
    hoisted relinearization; pure-x / pure-y / constant terms ride separate
    fused combinations (no ct*ct multiply spent on them)."""
    rows: Dict[int, Dict[int, complex]] = {}
    const = 0.0
    lin_b: Dict[int, complex] = {}
    lin_a: Dict[int, complex] = {}
    for (i, j), c in coeffs.items():
        if i == 0 and j == 0:
            const += c
        elif i == 0:
            lin_b[j] = lin_b.get(j, 0) + c
        elif j == 0:
            lin_a[i] = lin_a.get(i, 0) + c
        else:
            rows.setdefault(i, {})[j] = c
    lhs, rhs = [], []
    for i, row in sorted(rows.items()):
        js = sorted(row)
        lhs.append(bx[i])
        rhs.append(eng.linear_combination([by[j] for j in js],
                                          [row[j] for j in js]))
    res = eng.inner_product(lhs, rhs)
    if lin_a:
        ks = sorted(lin_a)
        res = eng.add(res, eng.linear_combination(
            [bx[k] for k in ks], [lin_a[k] for k in ks]))
    if lin_b:
        ks = sorted(lin_b)
        res = eng.add(res, eng.linear_combination(
            [by[k] for k in ks], [lin_b[k] for k in ks]))
    if const:
        res = eng.add_plain(res, const)
    return res


class XORService:
    """4-bit and 8-bit homomorphic XOR + AddRoundKey
    (port of /root/reference/xor_service.py:227-552)."""

    BOOT_LEVEL = 8   # level<8 => bootstrap, /root/reference/xor_service.py:274-277

    def __init__(self, engine_wrapper: EngineWrapper,
                 coeff_cache: CoefficientCache | None = None,
                 nibble_hi_cache: CoefficientCache | None = None,
                 nibble_lo_cache: CoefficientCache | None = None,
                 full_xor_cache: FullXORCache | None = None,
                 lo_lift_cache: CoefficientCache | None = None,
                 nibble_hi_path=None, nibble_lo_path=None):
        # the nibble_*_path kwargs accept CoefficientCache objects too, for
        # drop-in parity with the reference tests' (broken) fixture signature
        self.eng_wrap = engine_wrapper
        self.coeff_cache = coeff_cache or CoefficientCache(
            COEFF_DIR / "xor_mono_coeffs.json")
        self.nibble_hi_cache = (nibble_hi_cache or nibble_hi_path or
                                CoefficientCache(COEFF_DIR / "nibble_hi16_coeffs.json"))
        self.nibble_lo_cache = (nibble_lo_cache or nibble_lo_path or
                                CoefficientCache(COEFF_DIR / "nibble_test.json"))
        self.full_xor_cache = full_xor_cache or FullXORCache(
            COEFF_DIR / "xor_256x256_coeffs.json")
        self.lo_lift_cache = lo_lift_cache or CoefficientCache(
            COEFF_DIR / "lo_lift_coeffs.json")
        # key-pattern -> encoded ARK weight plaintexts (see
        # _xor_with_plain_nibbles); 32 patterns cover a full AES-128 key
        # schedule (11 round keys x hi/lo) with headroom
        self._ark_pt_cache: Dict[bytes, Any] = {}

    _ARK_CACHE_CAP = 32

    @property
    def eng(self) -> EngineWrapper:
        return self.eng_wrap

    # ------------------------------------------------------------------
    def _maybe_bootstrap(self, ct: Ciphertext, need: int) -> Ciphertext:
        if ct.level < need and self.eng_wrap.engine.use_bootstrap:
            return self.eng_wrap.bootstrap(ct)
        return ct

    def _build_power_basis(self, ct: Ciphertext) -> Dict[int, Ciphertext]:
        """t^1..t^15 in zeta16 domain: degree-8 ladder + conjugation for the
        upper half (t^(16-k) = conj(t^k), /root/reference/xor_service.py:245-254).
        Index 0 is intentionally absent: constant terms are handled
        symbolically by linear_combination."""
        eng = self.eng_wrap
        pos = eng.make_power_basis(ct, 8)
        basis = {i + 1: c for i, c in enumerate(pos)}
        for k in range(1, 8):
            basis[16 - k] = eng.conjugate(pos[k - 1])
        return basis

    def _build_power_basis_256(self, ct: Ciphertext) -> Dict[int, Ciphertext]:
        return build_power_basis_256(self.eng_wrap, ct)

    # ------------------------------------------------------------------
    def _lut2d_cipher(self, enc_a, enc_b, basis_builder, coeffs):
        """res = sum_ij c_ij a^i b^j (shared bilinear_lut kernel)."""
        return bilinear_lut(self.eng_wrap, basis_builder(enc_a),
                            basis_builder(enc_b), coeffs)

    def xor_cipher(self, enc_a: Ciphertext, enc_b: Ciphertext) -> Ciphertext:
        """4-bit XOR of two zeta16-domain ciphertexts
        (/root/reference/xor_service.py:271-286)."""
        enc_a = self._maybe_bootstrap(enc_a, self.BOOT_LEVEL)
        enc_b = self._maybe_bootstrap(enc_b, self.BOOT_LEVEL)
        return self._lut2d_cipher(enc_a, enc_b, self._build_power_basis,
                                  self.coeff_cache.load_coeffs())

    def xor_cipher_full(self, enc_a: Ciphertext,
                        enc_b: Ciphertext) -> Ciphertext:
        """8-bit XOR of two zeta256-domain ciphertexts -- the 16384-term
        double sum that SIGKILLs the reference on CPU
        (/root/reference/xor_service.py:288-307, test_xor_service.py:89)."""
        return self._lut2d_cipher(enc_a, enc_b, self._build_power_basis_256,
                                  self.full_xor_cache.load_coeffs())

    # ------------------------------------------------------------------
    def xor(self, a_int: np.ndarray, b_int: np.ndarray) -> np.ndarray:
        """End-to-end 4-bit XOR (/root/reference/xor_service.py:318-328)."""
        eng = self.eng_wrap
        enc_a = eng.encrypt(ZetaEncoder.to_zeta(np.asarray(a_int), 16))
        enc_b = eng.encrypt(ZetaEncoder.to_zeta(np.asarray(b_int), 16))
        res = self.xor_cipher(enc_a, enc_b)
        return ZetaEncoder.from_zeta(eng.decrypt(res), 16)[:np.size(a_int)]

    def xor256(self, a_int: np.ndarray, b_int: np.ndarray) -> np.ndarray:
        eng = self.eng_wrap
        enc_a = eng.encrypt(ZetaEncoder.to_zeta(np.asarray(a_int), 256))
        enc_b = eng.encrypt(ZetaEncoder.to_zeta(np.asarray(b_int), 256))
        res = self.xor_cipher_full(enc_a, enc_b)
        return ZetaEncoder.from_zeta(eng.decrypt(res), 256)[:np.size(a_int)]

    # ------------------------------------------------------------------
    def extract_nibbles(self, enc_vec: Ciphertext,
                        _shared_basis: Dict[int, Ciphertext] | None = None
                        ) -> Tuple[Ciphertext, Ciphertext]:
        """zeta256-domain byte ciphertext -> (zeta16^hi, zeta16^lo)
        (/root/reference/xor_service.py:434-496).

        lo = enc^16 exactly (domain reduction); hi = 256-point LUT with
        zeta16-range output evaluated as one fused linear combination over a
        shared power basis."""
        eng = self.eng_wrap
        basis = _shared_basis or self._build_power_basis_256(enc_vec)
        hi_coeffs = _dense_1d(self.nibble_hi_cache.path, 256)
        ks = [k for k in range(1, 256) if abs(hi_coeffs[k]) > 1e-12]
        enc_hi = eng.linear_combination([basis[k] for k in ks],
                                        [hi_coeffs[k] for k in ks],
                                        constant=hi_coeffs[0])
        enc_lo = basis[16]
        # optional identity LUT in the zeta16 domain (nibble_test.json parity)
        return enc_hi, enc_lo

    def cleanse(self, ct: Ciphertext, modulus: int = 16) -> Ciphertext:
        """Noise cleanse on roots of unity: z -> ((m+1)z - z^(m+1))/m.

        For z = zeta*(1+e) the first-order error term cancels exactly (in
        both phase and magnitude), so accumulated CKKS noise is squashed to
        O(m*e^2).  Deep compositions (full AES rounds) would otherwise push
        the zeta16 phase error past the decode boundary; the reference never
        gets deep enough to need this (SURVEY.md section 1 L5).
        Cost: 5 multiplies (z^2, z^4, z^8, z^16, z^17) + one fused combo.
        """
        eng = self.eng_wrap
        assert modulus == 16, "cleanse currently tuned for the nibble domain"
        z2 = eng.multiply(ct, ct)
        z4 = eng.multiply(z2, z2)
        z8 = eng.multiply(z4, z4)
        z16 = eng.multiply(z8, z8)
        z17 = eng.multiply(z16, ct)
        m = float(modulus)
        # scale-target the combine back to exactly Delta: the squaring chain
        # drifts the tracked scale multiplicatively (s -> s^2/q per level),
        # and repeated cleanses (e.g. after bootstrap) would compound the
        # drift until later LUTs sit orders of magnitude closer to the noise
        # floor
        return eng.linear_combination(
            [ct, z17], [(m + 1) / m, -1.0 / m],
            target_scale=self.eng_wrap.engine.params.scale)

    def lift_lo(self, lo16_ct: Ciphertext) -> Ciphertext:
        """zeta16^l -> zeta256^l via the 16-point lo_lift LUT (TPU build's
        consistent replacement for the reference's broken recombine,
        /root/reference/xor_service.py:541-547)."""
        eng = self.eng_wrap
        coeffs = _dense_1d(self.lo_lift_cache.path, 16)
        basis = self._build_power_basis(lo16_ct)
        ks = [k for k in range(1, 16) if abs(coeffs[k]) > 1e-12]
        return eng.linear_combination([basis[k] for k in ks],
                                      [coeffs[k] for k in ks],
                                      constant=coeffs[0])

    def recombine_nibbles(self, hi_ct: Ciphertext,
                          lo_ct: Ciphertext) -> Ciphertext:
        """byte = hi*16 + lo for zeta256-exponent nibbles
        (/root/reference/xor_service.py:256-269): hi -> hi^16, then multiply."""
        eng = self.eng_wrap
        hi16 = eng.make_power_basis(hi_ct, 16)[15]
        return eng.multiply(hi16, lo_ct)

    def recombine_nibbles16(self, hi16_ct: Ciphertext,
                            lo16_ct: Ciphertext) -> Ciphertext:
        """byte = hi*16 + lo for zeta16-domain nibbles: zeta16^hi is already
        zeta256^(16 hi); lift lo and multiply."""
        return self.eng_wrap.multiply(hi16_ct, self.lift_lo(lo16_ct))

    # ------------------------------------------------------------------
    def _xor_with_plain_nibbles(self, enc16: Ciphertext,
                                key_nibbles: np.ndarray) -> Ciphertext:
        """XOR a zeta16-domain ciphertext with *plaintext* per-slot nibbles.

        With the key in the clear, the 2D XOR LUT collapses to a 1D LUT with
        slot-dependent coefficients: w_i(slot) = sum_j c_ij zeta16^(j*k_slot),
        so the whole XOR costs 8 plaintext multiplies and no ct*ct multiply.
        This is the TPU build's AddRoundKey fast path (the round key is
        plaintext input in the reference pipeline too, SURVEY.md section 1 L5).
        """
        eng = self.eng_wrap
        sc = eng.engine.slot_count
        kn = np.asarray(key_nibbles, dtype=np.uint8).ravel()
        reps = -(-sc // kn.size)
        k = np.ascontiguousarray(np.tile(kn, reps)[:sc])
        # per-key encoded-plaintext cache (LRU): the 8 dense weight vectors
        # are key-dependent but call-invariant, and a fresh eng.encode per
        # call is a host FFT + device upload on the ARK hot path (the same
        # remote-device tax ops/bitplane._cached_pt already removes there)
        ck = k.tobytes()
        cached = self._ark_pt_cache.pop(ck, None)
        if cached is None:
            coeffs = self.coeff_cache.load_coeffs()
            zeta = np.exp(-2j * np.pi / 16)
            rows: Dict[int, np.ndarray] = {}
            const = np.zeros(sc, dtype=np.complex128)
            for (i, j), c in coeffs.items():
                w = c * zeta ** ((j * k.astype(np.int64)) % 16)
                if i == 0:
                    const += w
                else:
                    rows[i] = rows.get(i, 0) + w
            pts = [(i, eng.encode(w)) for i, w in sorted(rows.items())]
            cached = (pts, const if np.max(np.abs(const)) > 1e-12 else None)
        # under an abstract trace (eval_shape/jit) encode returns tracers;
        # caching one leaks it out of the trace and poisons every later
        # jitted call (the round-3 MULTICHIP regression).  Same guard as
        # Engine._perm_dev (core/engine.py).
        if not any(isinstance(pt.data, jax.core.Tracer) for _, pt in
                   cached[0]):
            self._ark_pt_cache[ck] = cached      # (re)insert: LRU recency
            while len(self._ark_pt_cache) > self._ARK_CACHE_CAP:
                self._ark_pt_cache.pop(next(iter(self._ark_pt_cache)))
        pts, const = cached
        basis = self._build_power_basis(enc16)
        # ONE fused dense combination (single kernel, single rescale)
        acc = eng.linear_combination([basis[i] for i, _ in pts],
                                     [pt for _, pt in pts])
        if const is not None:
            acc = eng.add(acc, const)
        return acc

    def add_round_key(self, enc_state: Ciphertext,
                      round_key: np.ndarray) -> Ciphertext:
        """AddRoundKey on a zeta256-domain state with a plaintext round key
        (/root/reference/xor_service.py:499-547, minus its DEBUG decrypts).

        Pipeline: shared 255-power basis -> nibble extraction -> two 4-bit
        XORs against the plaintext key nibbles -> recombine to zeta256.
        """
        basis = self._build_power_basis_256(enc_state)
        s_hi, s_lo = self.extract_nibbles(enc_state, _shared_basis=basis)
        k_hi, k_lo = split_nibbles(np.asarray(round_key, dtype=np.uint8))
        x_hi = self._xor_with_plain_nibbles(s_hi, k_hi)
        x_lo = self._xor_with_plain_nibbles(s_lo, k_lo)
        return self.recombine_nibbles16(x_hi, x_lo)

    def add_round_key_full(self, enc_state: Ciphertext,
                           round_key: np.ndarray) -> Ciphertext:
        """Byte-domain ARK via the full 256x256 XOR LUT with an encrypted key
        (/root/reference/xor_service.py:549-552)."""
        eng = self.eng_wrap
        zrk = ZetaEncoder.to_zeta(np.asarray(round_key), 256)
        enc_key = eng.encrypt(zrk)
        return self.xor_cipher_full(enc_state, enc_key)
