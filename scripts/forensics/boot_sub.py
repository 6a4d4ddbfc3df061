"""Reduced repro: bootstrap -> cleanse(xN) -> sub_bytes on boot_tiny,
with magnitude + tracked-scale diagnostics at each step."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AESFHE_JAX_CACHE", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu.ops.xor_service import (XORConfig, EngineWrapper, XORService)
from aesfhe_tpu.ops.mixcolumns_service import AESFHETransformer
from aesfhe_tpu.ops.zeta import ZetaEncoder, split_nibbles
from aesfhe_tpu.ops.xor_service import CoefficientCache
from aesfhe_tpu.coeffs.generate import COEFF_DIR, AES_SBOX

keys_mod.seed_keygen(0)
cfg = XORConfig(profile="boot_tiny", use_bootstrap=True)
wrap = EngineWrapper(cfg)
xor_svc = XORService(wrap)
tf = AESFHETransformer(wrap, xor_svc)
eng = wrap.engine
sc = eng.slot_count
rng = np.random.default_rng(3)
state = rng.integers(0, 256, sc, dtype=np.uint8)
s_hi, s_lo = split_nibbles(state)


def diag(ct, tag, want16):
    v = wrap.decrypt(ct)
    ph = np.angle(v) * 16 / (2 * np.pi)
    err = np.abs(ph - np.round(ph)).max()
    mag = np.abs(np.abs(v) - 1.0).max()
    got = ZetaEncoder.from_zeta(v, 16)
    bad = int((got != want16).sum())
    print(f"{tag:26s} lvl={ct.level:2d} scale={ct.scale:.6e} "
          f"phase_err={err:.4f} mag_err={mag:.4f} bad={bad}", flush=True)


hi = wrap.encrypt(ZetaEncoder.to_zeta(s_hi, 16))
diag(hi, "fresh", s_hi)

boot = wrap.bootstrap(eng._drop(hi, 2))
diag(boot, "bootstrap", s_hi)
c1 = xor_svc.cleanse(boot)
diag(c1, "cleanse x1", s_hi)
c2 = xor_svc.cleanse(c1)
diag(c2, "cleanse x2", s_hi)

hi2d = CoefficientCache(COEFF_DIR / "sbox_hi2d_coeffs.json")
lo2d = CoefficientCache(COEFF_DIR / "sbox_lo2d_coeffs.json")

lo_fresh = wrap.encrypt(ZetaEncoder.to_zeta(s_lo, 16))
lo_boot = xor_svc.cleanse(xor_svc.cleanse(wrap.bootstrap(eng._drop(lo_fresh, 2))))
diag(lo_boot, "lo boot+cleanse x2", s_lo)

want_hi = (AES_SBOX[state] >> 4).astype(np.uint8)
want_lo = (AES_SBOX[state] & 0xF).astype(np.uint8)

# power bases after bootstrap
bh = xor_svc._build_power_basis(c2)
bl = xor_svc._build_power_basis(lo_boot)
for p in (1, 8, 15):
    v = wrap.decrypt(bh[p])
    want = ZetaEncoder.to_zeta((s_hi.astype(np.int64) * p) % 16, 16)
    print(f"  basis hi^{p:2d} lvl={bh[p].level} scale={bh[p].scale:.6e} "
          f"err={np.abs(v - want).max():.4f}", flush=True)

out_hi = tf._bilinear(bh, bl, hi2d.load_coeffs())
diag(out_hi, "sub_bytes hi (boot in)", want_hi)
out_lo = tf._bilinear(bh, bl, lo2d.load_coeffs())
diag(out_lo, "sub_bytes lo (boot in)", want_lo)

# control: same circuit from fresh ciphertexts dropped to the same level
hf = eng._drop(wrap.encrypt(ZetaEncoder.to_zeta(s_hi, 16)), c2.level)
lf = eng._drop(wrap.encrypt(ZetaEncoder.to_zeta(s_lo, 16)), lo_boot.level)
bh2 = xor_svc._build_power_basis(hf)
bl2 = xor_svc._build_power_basis(lf)
out2 = tf._bilinear(bh2, bl2, hi2d.load_coeffs())
diag(out2, "sub_bytes hi (fresh in)", want_hi)
